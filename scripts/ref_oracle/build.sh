#!/bin/bash
# Build the reference StoCS engine as a standalone CPU oracle.
#
# Copies /root/reference/src/3rdparty/super4pcs/src/super4pcs into a build
# dir OUTSIDE the repo (the reference tree is never edited; the repo never
# holds reference code), applies two path patches the VERDICT prescribed
# (the hardcoded author paths super4pcs_test.cc:76 and match4pcsBase.cc:1920),
# and compiles the needed TUs directly with g++ - the reference's catkin
# CMake is bypassed (no ROS here). Vendored Eigen 3.3.90 + system OpenCV4.
#
# Output: $WORK/ref_oracle (see driver.cc for the CLI).
set -euo pipefail

WORK=${1:-/tmp/ref_oracle}
REF=/root/reference/src/3rdparty/super4pcs
HERE=$(dirname "$(readlink -f "$0")")

mkdir -p "$WORK"
rm -rf "$WORK/src"
cp -r "$REF/src/super4pcs" "$WORK/src"
chmod -R u+w "$WORK/src"

# Patch 1: hull.ply comes from $ORACLE_MODELS_DIR/<obj>/hull.ply instead of
# the author's home directory (super4pcs_test.cc:76).
sed -i 's|"/home/chaitanya/github/PhysimGlobalPose/src/physim_pose_estimation/models_search/"|(std::string(std::getenv("ORACLE_MODELS_DIR") ? std::getenv("ORACLE_MODELS_DIR") : ".") + "/")|' \
  "$WORK/src/super4pcs_test.cc"

# Patch 2: the timing side-file goes to /tmp instead of the author's dataset
# drive (match4pcsBase.cc:1920).
sed -i 's|/media/chaitanya/DATADRIVE0/datasets/YCB_Video_Dataset/time.txt|/tmp/ref_oracle_time.txt|' \
  "$WORK/src/algorithms/match4pcsBase.cc"

grep -q ORACLE_MODELS_DIR "$WORK/src/super4pcs_test.cc" || { echo "patch 1 failed"; exit 1; }
grep -q ref_oracle_time "$WORK/src/algorithms/match4pcsBase.cc" || { echo "patch 2 failed"; exit 1; }

# Patch 3: computePPF (match4pcsBase.cc:582-598) is declared bool but has NO
# return statement - UB that g++12 at -O1+ compiles to a fall-through crash
# (verified: SEGV at the first StoCS base selection, ASan backtrace through
# SelectQuadrilateralStoCS). Every call site ignores the return value, so
# `return true` is semantics-preserving. (The author's catkin/older-gcc build
# emitted a normal epilogue despite the UB.) This is the only
# -Wreturn-type hit in the five TUs.
sed -i 's|  ppf_.push_back(approximate_bin(ppf_4, rot_disc));|  ppf_.push_back(approximate_bin(ppf_4, rot_disc));\n  return true;|' \
  "$WORK/src/algorithms/match4pcsBase.cc"
grep -q "return true;" "$WORK/src/algorithms/match4pcsBase.cc" || { echo "patch 3 failed"; exit 1; }

# gnu++14: the 2017-era sources predate C++17's removals; -w: the reference
# code warns copiously and none of it is ours to fix. io.cc is built WITHOUT
# USE_OPENCV (texture loading unused - we only exchange point PLYs); OpenCV
# is still linked for match4pcsBase.cc's probability-image imread.
# -include random/chrono: the 2017 sources use std::discrete_distribution /
# system_clock without including <random>/<chrono> (they arrived transitively
# through PCL-era libstdc++ headers in the original build).
g++ -O2 -std=gnu++14 -w -include cstdlib -include random -include chrono \
  -I"$WORK/src" -I"$REF/3rdparty/Eigen" -I"$HERE/shim" \
  $(pkg-config --cflags opencv4) \
  "$HERE/driver.cc" \
  "$WORK/src/super4pcs_test.cc" \
  "$WORK/src/algorithms/match4pcsBase.cc" \
  "$WORK/src/algorithms/super4pcs.cc" \
  "$WORK/src/algorithms/4pcs.cc" \
  "$WORK/src/io/io.cc" \
  -o "$WORK/ref_oracle" \
  -lopencv_core -lopencv_imgcodecs

echo "built: $WORK/ref_oracle"
