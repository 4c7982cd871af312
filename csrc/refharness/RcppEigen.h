// RcppEigen facade: the reference only needs Eigen itself plus the
// Rcpp surface (util.h includes <RcppEigen.h>).  Eigen headers come
// from the TensorFlow wheel's vendored copy (see build_refharness.sh).
#pragma once
#include <Eigen/Dense>

#include "Rcpp.h"
