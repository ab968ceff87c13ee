from multike_tpu.data.kg import KG, KGs, read_kgs_from_folder  # noqa: F401
from multike_tpu.data.dataset import DataModel  # noqa: F401
