"""Static loader registry (replaces the reference's importlib dispatch,
src/data_loaders/DataLoaderFactory.py:14-26)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional


def get_data_loader(configs: dict, data_dirpath: Path, mode: Optional[str]):
    name = configs["data_loader"]["data_loader_name"]
    if name.startswith("NerfLlff"):
        from simplenerf_tpu.data.llff import NerfLlffDataLoader

        return NerfLlffDataLoader(configs, data_dirpath, mode)
    if name.startswith("RealEstate"):
        from simplenerf_tpu.data.realestate import RealEstateDataLoader

        return RealEstateDataLoader(configs, data_dirpath, mode)
    raise ValueError(f"Unknown data loader: {name}")
