#!/bin/bash
# Build the native (C++) components into vae_extent_search_tpu/native/.
set -e
cd "$(dirname "$0")/.."
mkdir -p vae_extent_search_tpu/native
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    csrc/record_parser.cpp csrc/extent_featurizer.cpp \
    csrc/per_store_featurizer.cpp \
    -o vae_extent_search_tpu/native/libves_native.so -lpthread
echo "built vae_extent_search_tpu/native/libves_native.so"
