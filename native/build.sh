#!/bin/sh
# Build the native batch loader. Output lands next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libhig_loader.so loader.cpp -lpthread
echo "built $(pwd)/libhig_loader.so"
