#!/bin/bash
# Build the stock VTM-10.0 DecoderApp as the end-to-end conformance oracle:
# our encoder's bitstreams must decode in it with matching MD5 hashes.
set -e
VTM=/root/reference/codec/vtm10.0-source-with-pmp-fast-alg
OUT=${1:-/tmp/vtm_oracle}
mkdir -p "$OUT/dec"
cd "$OUT/dec"

CXXFLAGS="-O2 -std=c++14 -w -I$VTM/Lib/CommonLib -I$VTM/Lib -I$VTM/Lib/DecoderLib -I$VTM/Lib/Utilities"
compile() {
  local src=$1; shift
  local obj="$(basename "${src%.cpp}").o"
  [ -f "$obj" ] && [ "$obj" -nt "$src" ] && return 0
  g++ -c $CXXFLAGS "$@" "$src" -o "$obj"
}

for f in "$VTM"/Lib/DecoderLib/*.cpp "$VTM"/Lib/Utilities/*.cpp \
         "$VTM"/App/DecoderApp/*.cpp; do
  compile "$f" &
  while [ "$(jobs -r | wc -l)" -ge 8 ]; do wait -n; done
done
wait

# reuse CommonLib objects from the oracle build (non-PIC fine for exe too),
# skipping any object the decoder build already provides
for o in "$OUT"/*.o; do
  b=$(basename "$o")
  [ -f "./$b" ] && continue
  case "$b" in oracle_api.o|BinDecoder.o) continue;; esac
  echo "$o"
done > /tmp/objlist.txt
g++ -o "$OUT/DecoderApp" ./*.o $(cat /tmp/objlist.txt)
echo "built $OUT/DecoderApp"
