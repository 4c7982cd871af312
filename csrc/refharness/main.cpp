// Reference-execution parity harness: drives the GAUSS reference's
// dist / distmix / computeLD (compiled in place from
// /root/reference/src via the Rcpp facade in Rcpp.h) on bgzf panels
// and emits TSV on stdout for tests/test_ref_harness.py to diff
// against gauss_tpu.  Reference entry points:
//   dist      /root/reference/src/dist.cpp:30
//   distmix   /root/reference/src/distmix.cpp:30
//   computeLD /root/reference/src/computeLD.cpp:26
//
// Usage:
//   refharness dist      chr start end wing STUDY_POP  z idx dat pop [af1]
//   refharness distmix   chr start end wing P1=w,P2=w  z idx dat pop [af1]
//   refharness computeld chr start end 0    P1=w,P2=w  z idx dat pop [af1]
#include <cstdio>
#include <cstdlib>
#include <sstream>
#include <string>

#include "Rcpp.h"

using namespace Rcpp;

// the [[Rcpp::export]] functions, as defined in the reference sources
DataFrame dist(int chr, long long int start_bp, long long int end_bp,
               long long int wing_size, std::string study_pop,
               std::string input_file, std::string reference_index_file,
               std::string reference_data_file,
               std::string reference_pop_desc_file,
               Rcpp::Nullable<double> af1_cutoff);
DataFrame distmix(int chr, long long int start_bp, long long int end_bp,
                  long long int wing_size, DataFrame pop_wgt_df,
                  std::string input_file,
                  std::string reference_index_file,
                  std::string reference_data_file,
                  std::string reference_pop_desc_file,
                  Rcpp::Nullable<double> af1_cutoff);
List computeLD(int chr, long long int start_bp, long long int end_bp,
               DataFrame pop_wgt_df, std::string input_file,
               std::string reference_index_file,
               std::string reference_data_file,
               std::string reference_pop_desc_file,
               Rcpp::Nullable<double> af1_cutoff);

static DataFrame parse_pop_wgt(const std::string &s) {
  StringVector pops;
  NumericVector wgts;
  std::stringstream ss(s);
  std::string tok;
  while (std::getline(ss, tok, ',')) {
    auto eq = tok.find('=');
    if (eq == std::string::npos) throw std::runtime_error("bad pop=w: " + tok);
    pops.push_back(tok.substr(0, eq));
    wgts.push_back(std::stod(tok.substr(eq + 1)));
  }
  return DataFrame::create(Named("pop") = pops, Named("wgt") = wgts);
}

static void print_df(const DataFrame &df) {
  for (size_t c = 0; c < df.names.size(); c++)
    printf("%s%s", c ? "\t" : "", df.names[c].c_str());
  printf("\n");
  size_t n = df.nrows();
  for (size_t r = 0; r < n; r++) {
    for (size_t c = 0; c < df.cols.size(); c++) {
      if (c) printf("\t");
      const Column &col = df.cols[c];
      if (std::holds_alternative<StringVector>(col))
        printf("%s", std::get<StringVector>(col)[r].c_str());
      else if (std::holds_alternative<IntegerVector>(col))
        printf("%d", std::get<IntegerVector>(col)[r]);
      else
        printf("%.10g", std::get<NumericVector>(col)[r]);
    }
    printf("\n");
  }
}

int main(int argc, char **argv) {
  if (argc < 10) {
    fprintf(stderr,
            "usage: %s dist|distmix|computeld chr start end wing "
            "pop_spec z_file idx_file dat_file popdesc_file [af1_cutoff]\n",
            argv[0]);
    return 2;
  }
  std::string cmd = argv[1];
  int chr = atoi(argv[2]);
  long long start_bp = atoll(argv[3]);
  long long end_bp = atoll(argv[4]);
  long long wing = atoll(argv[5]);
  std::string pop_spec = argv[6];
  std::string zf = argv[7], idxf = argv[8], datf = argv[9], popf = argv[10];
  Nullable<double> af1 = R_NilValue;
  if (argc > 11) af1 = Nullable<double>(atof(argv[11]));

  try {
    if (cmd == "dist") {
      print_df(dist(chr, start_bp, end_bp, wing, pop_spec, zf, idxf, datf,
                    popf, af1));
    } else if (cmd == "distmix") {
      print_df(distmix(chr, start_bp, end_bp, wing, parse_pop_wgt(pop_spec),
                       zf, idxf, datf, popf, af1));
    } else if (cmd == "computeld") {
      List l = computeLD(chr, start_bp, end_bp, parse_pop_wgt(pop_spec), zf,
                         idxf, datf, popf, af1);
      print_df(std::get<DataFrame>(l["snplist"]));
      printf("##cormat\n");
      const NumericMatrix &m = std::get<NumericMatrix>(l["cormat"]);
      for (size_t i = 0; i < m.nrow(); i++) {
        for (size_t j = 0; j < m.ncol(); j++)
          printf("%s%.10g", j ? "\t" : "", m(i, j));
        printf("\n");
      }
    } else {
      fprintf(stderr, "unknown command %s\n", cmd.c_str());
      return 2;
    }
  } catch (const std::exception &e) {
    fprintf(stderr, "refharness error: %s\n", e.what());
    return 1;
  }
  return 0;
}
