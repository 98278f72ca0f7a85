from uemda_tpu.datasets.meta import DATASET_META, DatasetMeta, IsprsDA, LoveDA
