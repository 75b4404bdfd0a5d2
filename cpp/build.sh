#!/bin/sh
# Build the native runtime into cpp/build (libyf.so + yf_runner).
set -e
cd "$(dirname "$0")"
cmake -S . -B build -G Ninja >/dev/null
cmake --build build
echo "built: $(ls build/libyf.so 2>/dev/null) $(ls build/yf_runner 2>/dev/null)"
