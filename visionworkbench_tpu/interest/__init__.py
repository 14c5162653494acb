"""Interest points — TPU-native replacement for ``src/vw/InterestPoint/``."""

from visionworkbench_tpu.interest.types import (
    ImageOctaveHistory, InterestPoints, from_numpy,
)
from visionworkbench_tpu.interest.operators import (
    harris_interest, image_gradients, log_interest,
)
from visionworkbench_tpu.interest.detector import (
    assign_orientations, assign_orientations_scaled, concatenate_points,
    detect_points, detect_points_dog, detect_points_obalog,
    detect_points_scaled, detect_sift_like,
)
from visionworkbench_tpu.interest.descriptor import (
    PCABasis, describe, fit_pca_basis, patch_descriptor, pca_descriptor,
    sgrad_descriptor,
)
from visionworkbench_tpu.interest.matcher import (
    Matches, match_points, matched_coordinates,
)
from visionworkbench_tpu.interest.io import (
    match_filename, read_binary_ip_file, read_binary_match_file,
    read_text_match_file, write_binary_ip_file, write_binary_match_file,
    write_text_match_file,
)
