from .cityscapes import CityscapesDataset
from .custom import CustomDataset
from .kvasir_seg import KvasirSegDataset
from .loader import DataLoader
from .standard_datasets import (ADE20KDataset, COCOStuffDataset,
                                ChaseDB1Dataset, DRIVEDataset, HRFDataset,
                                LoveDADataset, PascalVOCDataset,
                                PotsdamDataset, STAREDataset,
                                VaihingenDataset, iSAIDDataset)
from .synthetic import SyntheticDataset
