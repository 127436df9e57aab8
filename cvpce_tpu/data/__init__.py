"""Data layer: dataset indexers, host transforms, prefetch loader."""

from . import defaults, transforms  # noqa: F401
from .grocery import (  # noqa: F401
    GPBaselineDataset,
    GroceryProductsDataset,
    GroceryProductsTestSet,
    InternalTrainSet,
    SimpleFolderSet,
)
from .grozi import GroZiDataset, GroZiTestSet, extract_grozi_test_imgs  # noqa: F401
from .loader import PrefetchLoader  # noqa: F401
from .planograms import (  # noqa: F401
    InternalPlanoSet,
    PlanogramTestSet,
    read_tonioni_planogram,
)
from .sku110k import (  # noqa: F401
    SKU110KDataset,
    TargetDomainDataset,
    collate_detection,
    pad_boxes,
)
