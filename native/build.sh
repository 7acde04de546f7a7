#!/bin/sh
# Build the native loader shared library (invoked automatically on first use
# by pipeline/native_io.py; safe to run manually).
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libittloader.so loader.cpp -ljpeg -lpng -lpthread
echo "built native/libittloader.so"
