#!/bin/sh
# Build the native data-layer library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC ppst_io.cpp -o libppst_io.so
echo "built $(pwd)/libppst_io.so"
