#!/bin/sh
# Build the native runtime into cpp/build (libyf.so + yf_runner + yf_check).
#   cpp/build.sh --neon-sim        x86 NEON-shim build (yf_neon_check) into cpp/build-neonsim
#   cpp/build.sh                   release build
#   cpp/build.sh --sanitize        ASan+UBSan build into cpp/build-asan
#   cpp/build.sh --sanitize=thread TSan build (OpenMP off) into cpp/build-tsan
set -e
cd "$(dirname "$0")"
case "$1" in
  --sanitize=thread)
    cmake -S . -B build-tsan -G Ninja -DYF_SANITIZE=thread >/dev/null
    cmake --build build-tsan
    echo "built (tsan): $(ls build-tsan/yf_check 2>/dev/null)"
    ;;
  --neon-sim)
    cmake -S . -B build-neonsim -G Ninja -DYF_NEON_SIM=ON >/dev/null
    cmake --build build-neonsim
    echo "built (neon-sim): $(ls build-neonsim/yf_neon_check 2>/dev/null)"
    ;;
  --sanitize)
    cmake -S . -B build-asan -G Ninja -DYF_SANITIZE=ON >/dev/null
    cmake --build build-asan
    echo "built (asan): $(ls build-asan/libyf.so 2>/dev/null) $(ls build-asan/yf_runner 2>/dev/null)"
    ;;
  *)
    cmake -S . -B build -G Ninja >/dev/null
    cmake --build build
    echo "built: $(ls build/libyf.so 2>/dev/null) $(ls build/yf_runner 2>/dev/null)"
    ;;
esac
