#!/bin/bash
# Build the native audio decoder shared library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -o libaudiocraft_audio.so audio_decode.cc \
    -I/usr/include/x86_64-linux-gnu \
    -lavformat -lavcodec -lavutil -lswresample
echo "built $(pwd)/libaudiocraft_audio.so"
