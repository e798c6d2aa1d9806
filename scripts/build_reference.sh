#!/bin/sh
# Build the reference SentencePiece binaries (spm_train/spm_encode) for
# benchmark comparison. The reference checkout lacks the ICU-generated
# normalization_rule.h, so we copy the tree to /tmp, emit a byte-identical
# header from our own charsmap compiler (scripts/gen_normalization_rule_h.py,
# blobs verified interchangeable in tests/test_proto.py), and build there.
#
# Usage: scripts/build_reference.sh [BUILD_DIR]   (default /tmp/refbuild2)
set -e
REPO="$(dirname "$0")/.."
REF="${SPM_REFERENCE:-/root/reference}"
BUILD="${1:-/tmp/refbuild2}"
SRC=/tmp/refsrc

if [ -x "$BUILD/src/spm_train" ]; then
    echo "already built: $BUILD/src/spm_train" >&2
    exit 0
fi
rm -rf "$SRC" "$BUILD"
cp -r "$REF" "$SRC"
python "$REPO/scripts/gen_normalization_rule_h.py" "$SRC/src/normalization_rule.h"
mkdir -p "$BUILD"
cd "$BUILD"
cmake "$SRC" -DCMAKE_BUILD_TYPE=Release -DSPM_ENABLE_SHARED=OFF >cmake.log 2>&1
make -j"$(nproc)" spm_train spm_encode >make.log 2>&1
echo "built: $BUILD/src/spm_train" >&2
