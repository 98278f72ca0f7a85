from uemda_tpu.superpixels.native import (
    edge_shrink,
    slic_superpixels,
    superpixels_with_shrink,
)
