#!/bin/sh
# Build the native panel decoder shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    panel_decoder.cpp -o libgauss_panel.so -lz -lpthread
echo "built $(pwd)/libgauss_panel.so"
