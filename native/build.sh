#!/bin/bash
# Build the native audio/video shared libraries.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -o libaudiocraft_audio.so audio_decode.cc \
    -I/usr/include/x86_64-linux-gnu \
    -lavformat -lavcodec -lavutil -lswresample
g++ -O2 -fPIC -shared -o libaudiocraft_video.so video_mux.cc \
    -I/usr/include/x86_64-linux-gnu \
    -lavformat -lavcodec -lavutil -lswresample -lswscale
echo "built $(pwd)/libaudiocraft_audio.so and libaudiocraft_video.so"
