from asm_tpu.data.generator import generate_dataset, dataset_filename
from asm_tpu.data.io import read_pair_file, write_pair_file

__all__ = [
    "generate_dataset",
    "dataset_filename",
    "read_pair_file",
    "write_pair_file",
]
