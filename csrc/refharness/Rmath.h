// Rmath facade: dist.cpp/distmix.cpp include <Rmath.h> for the R
// normal-distribution entry points; R::pnorm5 is provided in Rcpp.h.
#pragma once
#include "Rcpp.h"
