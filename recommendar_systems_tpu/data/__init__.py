from recommendar_systems_tpu.data.dataset import RecDataset
from recommendar_systems_tpu.data.arrays import DataBundle, EvalBundle, build_data_bundle
from recommendar_systems_tpu.data.sampling import sample_negatives
