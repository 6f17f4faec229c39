#!/bin/sh
# Build the reference Spiral binary (/root/reference) as a golden-test
# oracle.  Uses g++ + the local HEXL shim (golden/shim) in place of
# clang-12 + Intel HEXL; the shim only affects the self-consistent q'
# transform, so outputs are unchanged (see shim header).
#
# Usage: golden/build_reference.sh OUT_BINARY [TEXP TEXPRIGHT TCONV TGSW
#        QPBITS PVALUE QNUMFIRST QNUMREST OUTN]
# Defaults are the paper's (20, 256) Spiral parameters
# (all_parameter_choices.txt:67-81).
set -e
OUT=${1:-/tmp/spiral_ref}
TEXP=${2:-8}; TEXPRIGHT=${3:-56}; TCONV=${4:-4}; TGSW=${5:-8}
QPBITS=${6:-20}; PVALUE=${7:-256}; QNUMFIRST=${8:-1}; QNUMREST=${9:-0}
OUTN=${10:-2}
REF=${SPIRAL_REF:-/root/reference}
HERE=$(dirname "$0")

g++ -O2 -std=c++17 -march=native -w \
    -I"$REF/include" -I"$HERE/shim" \
    -DTEXP=$TEXP -DTEXPRIGHT=$TEXPRIGHT -DTCONV=$TCONV -DTGSW=$TGSW \
    -DQPBITS=$QPBITS -DPVALUE=$PVALUE -DQNUMFIRST=$QNUMFIRST \
    -DQNUMREST=$QNUMREST -DOUTN=$OUTN \
    "$REF/src/spiral.cpp" "$REF/src/core.cpp" "$REF/src/constants.cpp" \
    "$REF/src/poly.cpp" "$REF/src/util.cpp" "$REF/src/client.cpp" \
    "$REF/src/testing.cpp" \
    -o "$OUT"
echo "built $OUT"
