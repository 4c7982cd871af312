#!/bin/sh
# Build the reference-execution parity harness: compiles the GAUSS
# reference C++ IN PLACE from /root/reference/src (read-only; nothing
# is copied into this repo) against the Rcpp facade in this directory.
# Eigen comes from the TensorFlow wheel's vendored headers.
set -e
HERE=$(dirname "$0")
REF=${GAUSS_REF_SRC:-/root/reference/src}
EIGEN=$(python - <<'EOF'
import os, glob
for p in glob.glob("/opt/venv/lib/python*/site-packages/tensorflow/include"):
    if os.path.isdir(os.path.join(p, "Eigen")):
        print(p); break
EOF
)
OUT=${1:-$HERE/refharness}
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
# bgzf.c is C (R builds it with the C compiler)
cc -O2 -w -I "$REF" -c "$REF/bgzf.c" -o "$TMP/bgzf.o"
c++ -O2 -std=c++17 -w \
    -I "$HERE" -I "$EIGEN" -I "$REF" \
    "$HERE/main.cpp" \
    "$REF/gauss.cpp" "$REF/util.cpp" "$REF/snp.cpp" \
    "$REF/dist.cpp" "$REF/distmix.cpp" "$REF/computeLD.cpp" \
    "$REF/qcat.cpp" "$REF/qcatmix.cpp" "$REF/prep_qcat.cpp" \
    "$REF/prep_qcatmix.cpp" "$REF/afmix.cpp" "$REF/cpw2.cpp" \
    "$REF/jepeg.cpp" "$REF/jepegmix.cpp" "$REF/gene.cpp" \
    "$REF/zmix.cpp" \
    "$TMP/bgzf.o" \
    -lz -o "$OUT"
echo "built $OUT"
