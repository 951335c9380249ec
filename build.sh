#!/usr/bin/env bash
# Build + test entry point (the reference's build.sh analog: it AOT-publishes
# the native library and packages the Python bindings; here the native host
# engine is compiled and the suite is run).
set -euo pipefail
cd "$(dirname "$0")"

echo "== native host engine =="
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o hnswindex_tpu/native/libhnswhost.so \
    hnswindex_tpu/native/hnsw_host.cpp -lpthread
echo "built hnswindex_tpu/native/libhnswhost.so"

echo "== python package =="
python -m pip install -e . --quiet 2>/dev/null || \
    echo "(pip install skipped; use PYTHONPATH=$(pwd))"

if [[ "${SKIP_TESTS:-0}" != "1" ]]; then
    echo "== tests =="
    python -m pytest tests/ -q
fi
