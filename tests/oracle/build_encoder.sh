#!/bin/bash
# Build the VTM-10.0+PMP EncoderApp (test/bench oracle only):
# - golden bitstreams + headers for conformance tests
# - CPU encode-time anchor for BASELINE
set -e
VTM=/root/reference/codec/vtm10.0-source-with-pmp-fast-alg
OUT=${1:-/tmp/vtm_oracle}
mkdir -p "$OUT/enc"
cd "$OUT/enc"

CXXFLAGS="-O2 -std=c++14 -w -I$VTM/Lib/CommonLib -I$VTM/Lib -I$VTM/Lib/EncoderLib -I$VTM/Lib/Utilities -I$VTM/Lib/DecoderLib"
compile() {
  local src=$1; shift
  local obj="$(basename "${src%.cpp}").o"
  [ -f "$obj" ] && [ "$obj" -nt "$src" ] && return 0
  g++ -c $CXXFLAGS "$@" "$src" -o "$obj"
}

for f in "$VTM"/Lib/EncoderLib/*.cpp "$VTM"/App/EncoderApp/*.cpp; do
  compile "$f" &
  while [ "$(jobs -r | wc -l)" -ge 8 ]; do wait -n; done
done
wait

# DecoderLib objects (DecLib is referenced by EncLib for recon debugging)
bash "$(dirname "$0")/build_decoder.sh" "$OUT" >/dev/null 2>&1 || true

# link object precedence: enc build > dec build (minus app mains) >
# oracle CommonLib objects, skipping duplicates by basename
{
  for o in $(ls "$OUT"/dec/*.o | grep -vE "decmain|DecApp"); do
    [ -f "./$(basename "$o")" ] && continue
    echo "$o"
  done
  for o in "$OUT"/*.o; do
    b=$(basename "$o")
    case "$b" in oracle_api.o|BinDecoder.o|BinEncoder.o) continue;; esac
    [ -f "./$b" ] && continue
    [ -f "$OUT/dec/$b" ] && continue
    echo "$o"
  done
} > /tmp/enc_objlist.txt
g++ -o "$OUT/EncoderApp" ./*.o $(cat /tmp/enc_objlist.txt)
echo "built $OUT/EncoderApp"
