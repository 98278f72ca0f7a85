from uemda_tpu.infer.slide import make_predictor, slide_predict, window_grid
from uemda_tpu.infer.evaluate import evaluate_dataset
from uemda_tpu.infer.pseudo_gen import generate_pseudo_labels
from uemda_tpu.infer.raster import RasterPlan, make_raster_predictor, raster_predict
from uemda_tpu.infer.quant import Int8Model, int8_apply
from uemda_tpu.infer.fastpath import (
    FastpathModel,
    build_fastpath,
    build_serving_params,
    calibrate_act_scales,
    make_serving_fn,
    serving_forward,
)
