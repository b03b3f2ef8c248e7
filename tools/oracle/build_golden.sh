#!/usr/bin/env bash
# Build and run the full-image golden generator: the reference's ACTUAL
# renderer (src/Render.cpp RenderSession + TBB tile loop) on the Cornell
# scene. Product: tests/golden/reference_cornell_512.png (committed, so the
# suite runs without the reference or a C++ toolchain).
#
# Staging: same shadow-copy scheme as build_oracle.sh (g++-12 compat fixes
# to Math.hpp), plus
#   * shim headers for <fmt/core.h> and <loguru.hpp> (the reference
#     FetchContents fmt from the network, unavailable here; logging is
#     irrelevant to pixels);
#   * one oneTBB-compat patch: `tbb::task::self().cancel_group_execution()`
#     (removed in oneTBB 2021) -> `renderTaskGroup.cancel()`. The line is
#     only reached when the progress callback returns Abort, which the
#     golden driver never does -- zero pixel effect.
# Nothing patched is committed.
set -euo pipefail

SPP=${1:-256}
REF=${REF:-/root/reference}
REPO=$(cd "$(dirname "$0")/../.." && pwd)
BUILD=${BUILD:-/tmp/cornelis_golden_build}
STAGE="$BUILD/ref"
OUT="$REPO/tests/golden"

mkdir -p "$BUILD" "$OUT"
rm -rf "$STAGE"
mkdir -p "$STAGE"
cp -r "$REF/include" "$REF/external" "$REF/src" "$STAGE/"

# g++-compat: defaulted special members must use the injected class name
# (same sed as build_oracle.sh).
sed -i \
    -e 's/floatN(floatN<N> const &) = default;/floatN(floatN const \&) = default;/' \
    -e 's/floatN(floatN<N> &&) = default;/floatN(floatN \&\&) = default;/' \
    -e 's/auto operator=(floatN<N> &) -> floatN<N> & = default;/auto operator=(floatN const \&) -> floatN \& = default;/' \
    -e 's/auto operator=(floatN<N> &&) -> floatN<N> & = default;/auto operator=(floatN \&\&) -> floatN \& = default;/' \
    -e 's/auto operator==(floatN<N> const &) const -> bool = default;/auto operator==(floatN const \&) const -> bool = default;/' \
    "$STAGE/include/cornelis/Math.hpp"

# oneTBB 2021 removed tbb::task::self(); the dead-unless-aborted cancel
# call becomes a task_group cancel.
sed -i \
    -e 's/tbb::task::self()\.cancel_group_execution();/renderTaskGroup.cancel();/' \
    "$STAGE/src/Render.cpp"

# Shim headers: fmt (network-fetched in the reference build) and loguru
# (vendored, but needs fmt). Only the call surface Render.cpp touches.
mkdir -p "$STAGE/shim/fmt"
cat > "$STAGE/shim/fmt/core.h" <<'EOF'
#pragma once
#include <string>
#include <string_view>
namespace fmt {
// Shim: only used for a per-tile thread name (src/Render.cpp:340); the
// formatted content never reaches pixels.
template <typename... Args>
inline std::string format(std::string_view f, Args &&...) { return std::string(f); }
} // namespace fmt
EOF
cat > "$STAGE/shim/loguru.hpp" <<'EOF'
#pragma once
#define LOG_F(...) ((void)0)
#define LOG_SCOPE_F(...) ((void)0)
namespace loguru {
inline void set_thread_name(char const *) {}
} // namespace loguru
EOF

g++ -std=c++20 -O2 -include algorithm \
    -I"$STAGE/include" -I"$STAGE/external" -I"$STAGE/src" -I"$STAGE/shim" \
    "$REPO/tools/oracle/golden_main.cpp" \
    "$STAGE/src/Render.cpp" \
    "$STAGE/src/Scene.cpp" \
    "$STAGE/src/Tiles.cpp" \
    "$STAGE/src/Geometry.cpp" \
    "$STAGE/src/Materials.cpp" \
    "$STAGE/src/Camera.cpp" \
    "$STAGE/src/Color.cpp" \
    "$STAGE/src/NanoVDBMath.cpp" \
    "$STAGE/src/extern/stb_image_write.cpp" \
    -ltbb -lpthread \
    -o "$BUILD/golden"

cd "$BUILD"
rm -f cornelisrender2.png
time ./golden "$SPP"
mv cornelisrender2.png "$OUT/reference_cornell_512.png"
echo "golden written: $OUT/reference_cornell_512.png (spp=$SPP)"
