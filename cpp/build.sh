#!/bin/sh
# Build the native runtime into cpp/build (libyf.so + yf_runner).
#   cpp/build.sh              release build
#   cpp/build.sh --sanitize   ASan+UBSan build into cpp/build-asan
set -e
cd "$(dirname "$0")"
if [ "$1" = "--sanitize" ]; then
  cmake -S . -B build-asan -G Ninja -DYF_SANITIZE=ON >/dev/null
  cmake --build build-asan
  echo "built (asan): $(ls build-asan/libyf.so 2>/dev/null) $(ls build-asan/yf_runner 2>/dev/null)"
else
  cmake -S . -B build -G Ninja >/dev/null
  cmake --build build
  echo "built: $(ls build/libyf.so 2>/dev/null) $(ls build/yf_runner 2>/dev/null)"
fi
