#!/bin/sh
# Build the native preprocessing library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    preprocess.cpp -o libdmt_preproc.so
echo "built $(pwd)/libdmt_preproc.so"
