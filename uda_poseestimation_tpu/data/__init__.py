"""Dataset registry — name-based lookup parity with reference lib/datasets.

Trainers resolve datasets by string via this module's ``__dict__`` exactly
like the reference (train_human.py:87, train_animal.py:68).
"""

from .animal_pose import Animal_Pose, Animal_Pose_mt, animal_pose, animal_pose_mt
from .freihand import FreiHand
from .hand_3d_studio import (
    Hand3DStudio,
    Hand3DStudioAll,
    Hand3DStudioAll_mt,
    Hand3DStudio_mt,
)
from .human36m import Human36M, Human36M_mt
from .keypoint_dataset import (
    Animal14KeypointDataset,
    Animal18KeypointDataset,
    Body16KeypointDataset,
    Hand21KeypointDataset,
    KeypointDataset,
)
from .generic_transforms import (
    DeNormalizeAndTranspose,
    Denormalize,
    MultipleApply,
    NormalizeAndTranspose,
    RandomErasing,
    ResizeImage,
)
from .loader import DataLoader, ForeverDataIterator, default_collate
from .samplers import CombineDataset, RandomMultipleGallerySampler, concatenate
from .lsp import LSP, LSP_mt
from .real_animal import (
    Real_Animal_All,
    Real_Animal_All_mt,
    real_animal_all,
    real_animal_all_mt,
)
from .rendered_hand_pose import RenderedHandPose, RenderedHandPose_mt
from .surreal import SURREAL
from .synthetic_animal import (
    Synthetic_Animal_SP_All,
    Synthetic_Animal_SP_All_Other,
    generate_data_file,
    synthetic_animal_sp_all,
    synthetic_animal_sp_all_other,
)

__all__ = [
    "RenderedHandPose", "Hand3DStudio", "Hand3DStudioAll", "RenderedHandPose_mt",
    "Hand3DStudio_mt", "Hand3DStudioAll_mt", "FreiHand",
    "real_animal_all", "real_animal_all_mt", "animal_pose", "animal_pose_mt",
    "synthetic_animal_sp_all", "synthetic_animal_sp_all_other",
    "SURREAL", "LSP", "LSP_mt", "Human36M", "Human36M_mt",
    "KeypointDataset", "Body16KeypointDataset", "Hand21KeypointDataset",
    "Animal18KeypointDataset", "Animal14KeypointDataset",
    "DataLoader", "ForeverDataIterator", "default_collate", "generate_data_file",
]
