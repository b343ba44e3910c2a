from pnnp_tpu.data.io import dataload, pack_raw_np, load_info, save_info
from pnnp_tpu.data.crops import CropPlanner
from pnnp_tpu.data.datasets import (
    BaseRawDataset,
    SIDDataset,
    SynDataset,
    RawDataset,
    NFSynDataset,
    ProxyDataset,
    ELDDataset,
    MixDataset,
    PMNNPDataset,
    SFRNDataset,
    TestDataset,
    MultiDataset,
    DATASET_REGISTRY,
    build_dataset,
)
from pnnp_tpu.data.loader import DataLoader, collate
from pnnp_tpu.data import infos
from pnnp_tpu.data.extra import ImgDataset, MixedSubsetDataset
from pnnp_tpu.data import phone
