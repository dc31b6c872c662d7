// Reference-oracle driver: runs the UNMODIFIED (path-patched only) StoCS
// engine from /root/reference/src/3rdparty/super4pcs on inputs produced by
// the TPU framework, so the two systems can be compared on identical data.
//
// The reference pipeline calls getProbableTransformsSuper4PCS
// (super4pcs_test.cc:39-111) with PLY paths written by
// CongruentSetMatching::generate (ObjectPoseCandidateSet.cpp:52-68) plus an
// in-memory PPF map parsed from PPFMap.txt (Objects.cpp:31-49). This driver
// reproduces exactly that call: it parses a PPFMap.txt, builds the camera
// intrinsics, invokes the entry point, and dumps best pose + LCP + the
// improving-pose set to a plain text file for scripts/ref_parity.py.
//
// Usage:
//   ORACLE_MODELS_DIR=<dir with <obj>/hull.ply> ./ref_oracle \
//     <segment.ply> <model_validation.ply> <model_sampled.ply> <PPFMap.txt> \
//     <prob.png> <fx> <fy> <cx> <cy> <objName> <scenePath/> <out.txt>

#include <Eigen/Dense>
#include <Eigen/Geometry>

#include <cstdlib>
#include <fstream>
#include <iostream>
#include <map>
#include <string>
#include <utility>
#include <vector>

// C++ entry point compiled from the (path-patched) reference TU
// super4pcs_test.cc; signature per super4pcs_test.cc:39-43.
void getProbableTransformsSuper4PCS(
    std::string input1, std::string input2, std::string input3,
    std::pair<Eigen::Isometry3d, float> &bestHypothesis,
    std::vector<std::pair<Eigen::Isometry3d, float> > &hypothesisSet,
    std::string probImagePath,
    std::map<std::vector<int>, std::vector<std::pair<int, int> > > &PPFMap,
    int max_count_ppf, Eigen::Matrix3f camIntrinsic, std::string objName,
    std::string scenePath, std::vector<int> &registered_points);

// PPFMap.txt parser with the exact semantics of Objects::readPPFMap
// (Objects.cpp:31-49): rows of "f1 f2 f3 f4 count" then `count` index pairs.
static void readPPFMap(
    const std::string &path,
    std::map<std::vector<int>, std::vector<std::pair<int, int> > > &PPFMap) {
  std::ifstream ppfFile(path.c_str());
  if (!ppfFile) {
    std::cerr << "cannot open PPFMap " << path << std::endl;
    std::exit(2);
  }
  std::vector<int> ppf_feature(4);
  int pair_count, index1, index2;
  while (ppfFile >> ppf_feature[0] >> ppf_feature[1] >> ppf_feature[2] >>
         ppf_feature[3] >> pair_count) {
    std::vector<std::pair<int, int> > index_pairs;
    index_pairs.reserve(pair_count);
    for (int ii = 0; ii < pair_count; ii++) {
      ppfFile >> index1 >> index2;
      index_pairs.push_back(std::make_pair(index1, index2));
    }
    PPFMap.insert(std::make_pair(ppf_feature, index_pairs));
  }
  std::cout << "PPFMap size is: " << PPFMap.size() << std::endl;
}

int main(int argc, char **argv) {
  if (argc != 13) {
    std::cerr << "usage: ref_oracle segment.ply model_validation.ply "
                 "model_sampled.ply PPFMap.txt prob.png fx fy cx cy objName "
                 "scenePath out.txt"
              << std::endl;
    return 2;
  }
  std::string segment = argv[1], model = argv[2], sampled = argv[3];
  std::string ppfPath = argv[4], probImg = argv[5];
  Eigen::Matrix3f K = Eigen::Matrix3f::Identity();
  K(0, 0) = std::atof(argv[6]);
  K(1, 1) = std::atof(argv[7]);
  K(0, 2) = std::atof(argv[8]);
  K(1, 2) = std::atof(argv[9]);
  std::string objName = argv[10], scenePath = argv[11], outPath = argv[12];

  std::map<std::vector<int>, std::vector<std::pair<int, int> > > PPFMap;
  readPPFMap(ppfPath, PPFMap);

  std::pair<Eigen::Isometry3d, float> best;
  best.first.matrix().setIdentity();
  best.second = 0.f;
  std::vector<std::pair<Eigen::Isometry3d, float> > hypothesisSet;
  std::vector<int> registered_points;

  // max_count_ppf is declared-but-never-assigned in the reference
  // (Objects.hpp:24, SURVEY quirk list) - pass 0.
  getProbableTransformsSuper4PCS(segment, model, sampled, best, hypothesisSet,
                                 probImg, PPFMap, /*max_count_ppf=*/0, K,
                                 objName, scenePath, registered_points);

  std::ofstream out(outPath.c_str());
  out.precision(10);
  out << "best_lcp " << best.second << "\n";
  const Eigen::Matrix4d m = best.first.matrix();
  for (int r = 0; r < 4; r++)
    out << m(r, 0) << " " << m(r, 1) << " " << m(r, 2) << " " << m(r, 3)
        << "\n";
  out << "registered_points " << registered_points.size() << "\n";
  out << "n_improving " << hypothesisSet.size() << "\n";
  for (size_t i = 0; i < hypothesisSet.size(); i++) {
    const Eigen::Matrix4d h = hypothesisSet[i].first.matrix();
    out << hypothesisSet[i].second;
    for (int r = 0; r < 4; r++)
      for (int c = 0; c < 4; c++) out << " " << h(r, c);
    out << "\n";
  }
  out.close();
  std::cout << "oracle best lcp: " << best.second << std::endl;
  return 0;
}
