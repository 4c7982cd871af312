// Minimal Rcpp facade for compiling the GAUSS reference sources
// WITHOUT R, so the reference binary itself can serve as a parity
// oracle (the only oracle not authored by this repo).  Only the
// surface consumed by /root/reference/src/{gauss,util,snp,dist,
// distmix,computeLD}.cpp is provided: Rcout/stop, the *Vector
// wrappers, DataFrame/List/NumericMatrix, Nullable/as/Named, and
// R::pnorm5.  The reference sources are compiled IN PLACE from
// /root/reference/src (never copied); see build_refharness.sh.
#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <iostream>
#include <map>
#include <memory>
#include <numeric>
#include <stdexcept>
#include <string>
#include <variant>
#include <vector>

namespace Rcpp {

// Keep stdout clean for the harness's TSV output.
inline std::ostream &Rcout = std::cerr;

[[noreturn]] inline void stop(const std::string &msg) {
  throw std::runtime_error(msg);
}

class NumericMatrix;

template <class T>
class Vector {
 public:
  std::vector<T> v;
  // dim attribute analog: set when a NumericMatrix converts into a
  // Vector (Rcpp exports declared NumericVector may return a matrix;
  // the harness reshapes from these)
  size_t attr_nrow = 0, attr_ncol = 0;
  Vector() = default;
  explicit Vector(size_t n) : v(n) {}
  Vector(const NumericMatrix &m);  // defined after NumericMatrix
  Vector(const std::vector<T> &x) : v(x) {}
  Vector &operator=(const std::vector<T> &x) {
    v = x;
    return *this;
  }
  void push_back(const T &x) { v.push_back(x); }
  size_t size() const { return v.size(); }
  T &operator[](size_t i) { return v[i]; }
  const T &operator[](size_t i) const { return v[i]; }
  T &operator()(size_t i) { return v[i]; }
  const T &operator()(size_t i) const { return v[i]; }
  typename std::vector<T>::iterator begin() { return v.begin(); }
  typename std::vector<T>::iterator end() { return v.end(); }
};

using NumericVector = Vector<double>;
using IntegerVector = Vector<int>;
using StringVector = Vector<std::string>;
using CharacterVector = Vector<std::string>;
using LogicalVector = Vector<int>;

class NumericMatrix {
 public:
  size_t nr = 0, nc = 0;
  std::vector<double> v;
  NumericMatrix() = default;
  NumericMatrix(size_t r, size_t c) : nr(r), nc(c), v(r * c, 0.0) {}
  double &operator()(size_t i, size_t j) { return v[i * nc + j]; }
  double operator()(size_t i, size_t j) const { return v[i * nc + j]; }
  size_t nrow() const { return nr; }
  size_t ncol() const { return nc; }
};

// Rcpp lets an export declared NumericVector return a NumericMatrix
// (both are SEXP; R sees the dim attribute) -- prep_zmix5 does exactly
// that (/root/reference/src/zmix.cpp:44,186).  Mirror it with a
// converting constructor that flattens ROW-major and keeps the dims.
template <class T>
inline Vector<T>::Vector(const NumericMatrix &m)
    : v(m.v.begin(), m.v.end()), attr_nrow(m.nr), attr_ncol(m.nc) {}

using Column = std::variant<NumericVector, IntegerVector, StringVector>;

template <class T>
struct NamedT {
  std::string name;
  T value;
};

struct NamedProxy {
  std::string name;
  template <class T>
  NamedT<T> operator=(const T &x) const {
    return NamedT<T>{name, x};
  }
};

inline NamedProxy Named(const std::string &n) { return NamedProxy{n}; }

class DataFrame {
 public:
  std::vector<std::string> names;
  std::vector<Column> cols;

  template <class... Args>
  static DataFrame create(const Args &...args) {
    DataFrame df;
    (df.add(args), ...);
    return df;
  }
  template <class T>
  void add(const NamedT<T> &a) {
    names.push_back(a.name);
    cols.push_back(Column(a.value));
  }
  const Column &operator[](size_t i) const { return cols[i]; }
  const Column &operator[](const std::string &n) const {
    for (size_t i = 0; i < names.size(); i++)
      if (names[i] == n) return cols[i];
    throw std::runtime_error("no column " + n);
  }
  size_t size() const { return cols.size(); }
  size_t nrows() const {
    if (cols.empty()) return 0;
    return std::visit([](const auto &c) { return c.size(); }, cols[0]);
  }
};

// List carries the payload kinds the reference returns: DataFrame,
// NumericMatrix (computeLD/prep_* cormats) and NumericVector
// (prep_qcat z_vec, prep_recessive_impute zvec).
using ListItem = std::variant<DataFrame, NumericMatrix, NumericVector>;

class List {
 public:
  std::vector<std::string> names;
  std::vector<ListItem> items;

  template <class... Args>
  static List create(const Args &...args) {
    List l;
    (l.add(args), ...);
    return l;
  }
  template <class T>
  void add(const NamedT<T> &a) {
    names.push_back(a.name);
    items.push_back(a.value);
  }
  const ListItem &operator[](const std::string &n) const {
    for (size_t i = 0; i < names.size(); i++)
      if (names[i] == n) return items[i];
    throw std::runtime_error("no item " + n);
  }
};

struct NilType {};

template <class T>
class Nullable {
 public:
  bool has = false;
  T val{};
  Nullable() = default;
  Nullable(NilType) {}
  Nullable(const T &v) : has(true), val(v) {}
  bool isNotNull() const { return has; }
  bool isNull() const { return !has; }
};

// as<T>: only the instantiations the reference uses.
template <class T>
T as(const Column &);
template <>
inline std::vector<std::string> as<std::vector<std::string>>(
    const Column &c) {
  return std::get<StringVector>(c).v;
}
template <>
inline std::vector<double> as<std::vector<double>>(const Column &c) {
  if (std::holds_alternative<NumericVector>(c))
    return std::get<NumericVector>(c).v;
  std::vector<double> out;
  for (int x : std::get<IntegerVector>(c).v) out.push_back(x);
  return out;
}
template <class T>
T as(const Nullable<T> &n) {
  return n.val;
}

// Environment/Function: the ONE R callback the reference makes is
// stats::quantile(x, probs=p) from prep_zmix5[_sup]
// (/root/reference/src/zmix.cpp:123-128,274-278).  R's default
// quantile is type 7: h = (n-1)p, linear interpolation between order
// statistics -- reproduced here so the compiled reference runs the
// same selection cutoff R would.
class Function {
 public:
  std::string name;
  explicit Function(std::string n) : name(std::move(n)) {}
  NumericVector operator()(const NumericVector &x,
                           const NamedT<double> &probs) const {
    if (name != "quantile")
      throw std::runtime_error("refharness Function: only "
                               "stats::quantile is emulated, got " + name);
    std::vector<double> s = x.v;
    if (s.empty()) throw std::runtime_error("quantile of empty vector");
    std::sort(s.begin(), s.end());
    double p = probs.value;
    double h = (double)(s.size() - 1) * p;
    size_t lo = (size_t)std::floor(h);
    size_t hi = std::min(lo + 1, s.size() - 1);
    NumericVector out;
    out.push_back(s[lo] + (h - (double)lo) * (s[hi] - s[lo]));
    return out;
  }
};

class Environment {
 public:
  static Environment namespace_env(const std::string &) {
    return Environment();
  }
  Function operator[](const std::string &n) { return Function(n); }
};

}  // namespace Rcpp

inline constexpr Rcpp::NilType R_NilValue{};

namespace R {
// upper-tail standard normal: pnorm5(q, 0, 1, lower=0, log=0)
inline double pnorm5(double q, double mu, double sigma, int lower,
                     int log_p) {
  double z = (q - mu) / sigma;
  double p = 0.5 * std::erfc(z / std::sqrt(2.0));  // upper tail
  if (lower) p = 1.0 - p;
  if (log_p) p = std::log(p);
  return p;
}

namespace detail {
// regularized incomplete gamma P(a, x) by power series (x < a + 1)
inline double gamma_p_series(double a, double x) {
  double sum = 1.0 / a, term = sum;
  for (int n = 1; n < 10000; n++) {
    term *= x / (a + n);
    sum += term;
    if (std::fabs(term) < std::fabs(sum) * 1e-16) break;
  }
  return sum * std::exp(-x + a * std::log(x) - std::lgamma(a));
}

// regularized incomplete gamma Q(a, x) by Lentz continued fraction
inline double gamma_q_cf(double a, double x) {
  const double tiny = 1e-300;
  double b = x + 1.0 - a, c = 1.0 / tiny, d = 1.0 / b, h = d;
  for (int i = 1; i < 10000; i++) {
    double an = -1.0 * i * (i - a);
    b += 2.0;
    d = an * d + b;
    if (std::fabs(d) < tiny) d = tiny;
    c = b + an / c;
    if (std::fabs(c) < tiny) c = tiny;
    d = 1.0 / d;
    double del = d * c;
    h *= del;
    if (std::fabs(del - 1.0) < 1e-16) break;
  }
  return std::exp(-x + a * std::log(x) - std::lgamma(a)) * h;
}
}  // namespace detail

// chi-square CDF/upper tail: pchisq(q, df, lower, log) =
// P(a=df/2, x=q/2) regularized incomplete gamma (double precision to
// ~1e-14 relative; used by qcat's per-SNP pvals and gene.cpp's
// jepeg_pval, reference src/qcat.cpp:105, src/gene.cpp:509)
inline double pchisq(double q, double df, int lower, int log_p) {
  double a = df / 2.0, x = q / 2.0, p, qq;
  if (!(x > 0)) {
    p = 0.0;
    qq = 1.0;
  } else if (x < a + 1.0) {
    p = detail::gamma_p_series(a, x);
    qq = 1.0 - p;
  } else {
    qq = detail::gamma_q_cf(a, x);
    p = 1.0 - qq;
  }
  double r = lower ? p : qq;
  return log_p ? std::log(r) : r;
}
}  // namespace R
