from .config import load_config, product_dict, set_directories
from .metrics import MetricsWriter
