from uemda_tpu.alignment.balance import ClassBalanceState, class_balance_weight
from uemda_tpu.alignment.coral import coral_loss
from uemda_tpu.alignment.losses import (
    GHMState,
    cross_entropy_loss,
    cross_entropy_per_pixel,
    focal_loss,
    ghm_loss,
    loss_calc,
    loss_calc_uvem,
    ohem_cross_entropy,
    ups_loss,
    uvem_loss,
)
from uemda_tpu.alignment.pcl import prototype_contrastive_loss
from uemda_tpu.alignment.prototypes import (
    AlignerState,
    align_class,
    align_instance,
    compute_local_prototypes,
    init_aligner,
    init_avg,
    label_refine,
    pearson_dist,
    update_avg,
    update_prototype,
)
from uemda_tpu.alignment.whiten import class_ware_whitening_loss
