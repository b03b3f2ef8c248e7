#!/usr/bin/env bash
# Build and run the golden-oracle generator against the read-only reference
# mount. Products: tests/golden/oracle/*.f32 (committed to the repo so the
# suite runs without the reference or a C++ toolchain).
#
# The reference was developed against a compiler laxer than g++ 12 about
# defaulted operators spelled with a dependent alias (floatN<N> instead of
# the injected class name, Math.hpp:192-198) and about missing <algorithm>
# for std::clamp (Color.cpp). We stage a shadow copy under /tmp and apply
# those two mechanical fixes there; nothing patched is committed.
set -euo pipefail

REF=${REF:-/root/reference}
REPO=$(cd "$(dirname "$0")/../.." && pwd)
BUILD=${BUILD:-/tmp/cornelis_oracle_build}
STAGE="$BUILD/ref"
OUT="$REPO/tests/golden/oracle"

mkdir -p "$BUILD" "$OUT"
rm -rf "$STAGE"
mkdir -p "$STAGE"
cp -r "$REF/include" "$REF/external" "$REF/src" "$STAGE/"

# g++-compat: defaulted special members must use the injected class name.
sed -i \
    -e 's/floatN(floatN<N> const &) = default;/floatN(floatN const \&) = default;/' \
    -e 's/floatN(floatN<N> &&) = default;/floatN(floatN \&\&) = default;/' \
    -e 's/auto operator=(floatN<N> &) -> floatN<N> & = default;/auto operator=(floatN const \&) -> floatN \& = default;/' \
    -e 's/auto operator=(floatN<N> &&) -> floatN<N> & = default;/auto operator=(floatN \&\&) -> floatN \& = default;/' \
    -e 's/auto operator==(floatN<N> const &) const -> bool = default;/auto operator==(floatN const \&) const -> bool = default;/' \
    "$STAGE/include/cornelis/Math.hpp"

g++ -std=c++20 -O2 -include algorithm \
    -I"$STAGE/include" -I"$STAGE/external" \
    "$REPO/tools/oracle/oracle_main.cpp" \
    "$STAGE/src/Geometry.cpp" \
    "$STAGE/src/Materials.cpp" \
    "$STAGE/src/Camera.cpp" \
    "$STAGE/src/Color.cpp" \
    "$STAGE/src/NanoVDBMath.cpp" \
    -o "$BUILD/oracle"

"$BUILD/oracle" "$OUT"
