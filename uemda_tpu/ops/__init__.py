from uemda_tpu.ops.resize import resize_bilinear, upsample_logits
from uemda_tpu.ops.labels import (
    index_to_onehot,
    downscale_label,
    one_hot_ignore,
)
from uemda_tpu.ops.pseudo import pseudo_selection
from uemda_tpu.ops.segment import segment_sum, segment_max, superpixel_view_probs
from uemda_tpu.ops.uncertainty import pixel_entropy, uvem_weight
from uemda_tpu.ops.metrics import (
    confusion_matrix,
    iou_per_class,
    f1_per_class,
    precision_per_class,
    recall_per_class,
)
