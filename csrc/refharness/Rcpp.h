// Minimal Rcpp facade for compiling the GAUSS reference sources
// WITHOUT R, so the reference binary itself can serve as a parity
// oracle (the only oracle not authored by this repo).  Only the
// surface consumed by /root/reference/src/{gauss,util,snp,dist,
// distmix,computeLD}.cpp is provided: Rcout/stop, the *Vector
// wrappers, DataFrame/List/NumericMatrix, Nullable/as/Named, and
// R::pnorm5.  The reference sources are compiled IN PLACE from
// /root/reference/src (never copied); see build_refharness.sh.
#pragma once

#include <cmath>
#include <cstdint>
#include <iostream>
#include <map>
#include <memory>
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

template <class T>
class Vector {
 public:
  std::vector<T> v;
  Vector() = default;
  explicit Vector(size_t n) : v(n) {}
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

// List only needs to carry (DataFrame, NumericMatrix) items here.
class List {
 public:
  std::vector<std::string> names;
  std::vector<std::variant<DataFrame, NumericMatrix>> items;

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
  const std::variant<DataFrame, NumericMatrix> &operator[](
      const std::string &n) const {
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
}  // namespace R
