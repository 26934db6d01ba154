#!/bin/bash
# Build the VTM-10.0 CommonLib as a shared oracle library for golden tests.
# The reference tree is read-only; objects go to /tmp/vtm_oracle.
# Output: /tmp/vtm_oracle/libvtm_oracle.so  (CommonLib + C API wrapper)
set -e
VTM=/root/reference/codec/vtm10.0-source-with-pmp-fast-alg/Lib
OUT=${1:-/tmp/vtm_oracle}
SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$OUT"
cd "$OUT"

CXXFLAGS="-O1 -fPIC -std=c++14 -w -I$VTM/CommonLib -I$VTM"
compile() { # src extra_flags
  local src=$1; shift
  local obj="$(basename "${src%.cpp}").o"
  [ -f "$obj" ] && [ "$obj" -nt "$src" ] && return 0
  g++ -c $CXXFLAGS "$@" "$src" -o "$obj"
}

for f in "$VTM"/libmd5/*.cpp "$VTM"/CommonLib/*.cpp \
         "$VTM"/EncoderLib/BinEncoder.cpp "$VTM"/EncoderLib/CABACWriter.cpp "$VTM"/DecoderLib/BinDecoder.cpp "$VTM"/DecoderLib/VLCReader.cpp; do
  compile "$f" &
  while [ "$(jobs -r | wc -l)" -ge 8 ]; do wait -n; done
done
wait
compile "$VTM/CommonLib/x86/CommonDefX86.cpp" -msse4.2
compile "$VTM/CommonLib/x86/InitX86.cpp" -msse4.2
for f in "$VTM"/CommonLib/x86/sse41/*.cpp; do compile "$f" -msse4.1 -DUSE_SSE41; done
for f in "$VTM"/CommonLib/x86/sse42/*.cpp; do compile "$f" -msse4.2 -DUSE_SSE42; done
for f in "$VTM"/CommonLib/x86/avx/*.cpp; do compile "$f" -mavx -DUSE_AVX; done
for f in "$VTM"/CommonLib/x86/avx2/*.cpp; do compile "$f" -mavx2 -DUSE_AVX2; done

g++ -c $CXXFLAGS "$SCRIPT_DIR/oracle_api.cpp" -o oracle_api.o
g++ -shared -o libvtm_oracle.so ./*.o
echo "built $OUT/libvtm_oracle.so"
