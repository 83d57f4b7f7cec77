from .cityscapes import CityscapesDataset
from .custom import CustomDataset
from .kvasir_seg import KvasirSegDataset
from .loader import DataLoader
from .standard_datasets import ADE20KDataset, PascalVOCDataset
from .synthetic import SyntheticDataset
