from .hamming import (
    DESC_BITS,
    DESC_BYTES,
    TH_HIGH,
    TH_LOW,
    hamming_matrix,
    hamming_pairwise,
    knn2,
    mutual_best,
    pack_bits,
    unpack_bits,
)
from .image import (
    bilinear_sample,
    build_pyramid,
    gaussian_blur,
    nearest_sample,
    resize_bilinear,
    sobel_gradients,
)
from .fast import fast_score_map, nms3x3
from .topk_grid import select_topk_grid
