from . import dataset, transform
from .column_names import COLUMN_MAP, FINAL_COLUMN_MAP
from .data_factory import create_dataset, create_pipeline
from .loader import DataLoader, DevicePrefetcher
