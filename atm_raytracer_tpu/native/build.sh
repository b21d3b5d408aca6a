#!/bin/sh
# Build the native tile loaders. Run from anywhere; artifacts land next to
# the sources. Requires g++ and zlib (baked into the image).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -pthread dted_loader.cpp -o libdted_loader.so
g++ -O3 -shared -fPIC -std=c++17 -pthread geotiff_loader.cpp -lz -o libgeotiff_loader.so
echo "built $(pwd)/libdted_loader.so $(pwd)/libgeotiff_loader.so"
