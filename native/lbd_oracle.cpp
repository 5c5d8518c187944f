// LBD golden-oracle binary: OpenCV line_descriptor ground truth.
//
// SURVEY.md §4 notes Python cv2 lacks the line_descriptor binding, so
// LBD goldens need a small C++ oracle.  This binary reads a grayscale
// image, detects lines with cv::line_descriptor (LSD + BinaryDescriptor)
// and prints one line per segment:
//   x0 y0 x1 y1 d0 d1 ... d31
// Tests compare MATCHING AGREEMENT between our LBD and OpenCV's (the
// bit layouts differ by design; the semantics — which pairs match —
// should not).
//
// Build: make lbd_oracle   (links libopencv_line_descriptor)

#include <cstdio>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/line_descriptor.hpp>

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s image.png [min_length]\n", argv[0]);
    return 2;
  }
  cv::Mat img = cv::imread(argv[1], cv::IMREAD_GRAYSCALE);
  if (img.empty()) {
    fprintf(stderr, "cannot read %s\n", argv[1]);
    return 1;
  }
  double min_len = argc > 2 ? atof(argv[2]) : 15.0;

  using namespace cv::line_descriptor;
  cv::Ptr<BinaryDescriptor> bd = BinaryDescriptor::createBinaryDescriptor();
  std::vector<KeyLine> lines;
  cv::Mat mask = cv::Mat::ones(img.size(), CV_8UC1);
  bd->detect(img, lines, mask);
  cv::Mat desc;
  bd->compute(img, lines, desc);

  for (size_t i = 0; i < lines.size(); i++) {
    const KeyLine& kl = lines[i];
    if (kl.lineLength < min_len) continue;
    printf("%.2f %.2f %.2f %.2f", kl.startPointX, kl.startPointY,
           kl.endPointX, kl.endPointY);
    for (int b = 0; b < desc.cols; b++)
      printf(" %d", (int)desc.at<uint8_t>((int)i, b));
    printf("\n");
  }
  return 0;
}
