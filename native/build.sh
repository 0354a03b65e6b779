#!/bin/sh
# Build the native fast-IO library next to this script.
set -e
cd "$(dirname "$0")"
c++ -O3 -shared -fPIC -std=c++17 -o libfastio.so fastio.cpp
echo "built $(pwd)/libfastio.so"
