from .cityscapes import CityscapesDataset
from .custom import CustomDataset
from .kvasir_seg import KvasirSegDataset
from .loader import DataLoader
from .synthetic import SyntheticDataset
