"""Configuration — dataclass groups mirroring the reference's reflection-
based `arguments/__init__.py` ParamGroups, with the same flag vocabulary
and defaults, plus TPU-specific rasterizer/runtime knobs.

`add_args`/`from_args` replace the ParamGroup reflection: every field
becomes `--<name>`; `save_cfg`/`load_cfg` replace the `cfg_args` repr
round-trip (arguments/__init__.py:101-121) with JSON.
"""
from __future__ import annotations

import dataclasses
import json
import os
from argparse import ArgumentParser, Namespace
from typing import List, Optional

from .ops.rasterize import RasterConfig
from .ops.screen_space import GIParams


@dataclasses.dataclass
class ModelConfig:
    """Ref ModelParams (arguments/__init__.py:52-67)."""
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False
    # TPU additions
    capacity: int = 1 << 19          # initial Gaussian capacity (padded)
    # Capacity-growth ceiling: when densification saturates the current
    # bucket the trainer doubles capacity (grow_state) up to this bound —
    # the static-shape analog of the reference's unbounded reallocation
    # (gaussian_model.py:664-749). 0 disables growth.
    max_capacity: int = 1 << 22
    max_cameras: int = 0             # 0 = all (debug subsetting)


@dataclasses.dataclass
class OptimizationConfig:
    """Ref OptimizationParams (arguments/__init__.py:78-98)."""
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    BRDF_lr: float = 0.005
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    # Screen-size prune threshold in pixels, enabled after the first
    # opacity reset (the reference hardcodes 20 at train.py:504 —
    # calibrated for 800px images; scale it when training far from that
    # resolution).
    size_screen_threshold: float = 20.0
    random_background: bool = False
    # Quirk preserved from the reference: the BRDF LR schedule is offset by
    # a hard-coded 30000 regardless of --pbr_iteration
    # (scene/gaussian_model.py:390).
    brdf_lr_offset: int = 30_000


@dataclasses.dataclass
class TrainConfig:
    """Ref train.py top-level flags (train.py:821-899)."""
    pbr_iteration: int = 30_000
    metallic: bool = False
    tone: bool = False
    gamma: bool = False
    indirect: bool = False
    normal_tv_weight: float = 5.0
    brdf_tv_weight: float = 1.0
    env_tv_weight: float = 0.01
    test_iterations: List[int] = dataclasses.field(
        default_factory=lambda: [7_000, 30_000])
    save_iterations: List[int] = dataclasses.field(
        default_factory=lambda: [30_000, 35_000, 40_000])
    checkpoint_iterations: List[int] = dataclasses.field(default_factory=list)
    start_checkpoint: str = ""
    seed: int = 0
    light_base_res: int = 256
    # TPU scale-out: data-parallel width (cameras per step, one per chip
    # over a jax.sharding.Mesh). 1 = reference-equivalent single chip.
    dp: int = 1
    # gt HDRI for the fork's split_envmap_loss diagnostics (train.py:210);
    # empty = disabled (the loss term is commented out upstream anyway).
    hdri_path: str = ""


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    opt: OptimizationConfig = dataclasses.field(default_factory=OptimizationConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    raster: RasterConfig = dataclasses.field(default_factory=RasterConfig)
    gi: GIParams = dataclasses.field(default_factory=GIParams)


_GROUPS = ("model", "opt", "train", "raster", "gi")


def add_args(parser: ArgumentParser, cfg: Optional[Config] = None) -> None:
    cfg = cfg or Config()
    seen = set()
    for gname in _GROUPS:
        group = getattr(cfg, gname)
        pg = parser.add_argument_group(gname)
        fields = (dataclasses.fields(group) if dataclasses.is_dataclass(group)
                  else [])
        items = [(f.name, getattr(group, f.name)) for f in fields] \
            if fields else list(group._asdict().items())
        for name, value in items:
            if name in seen:
                continue
            seen.add(name)
            if isinstance(value, bool):
                pg.add_argument(f"--{name}", action="store_true", default=None)
            elif isinstance(value, list):
                pg.add_argument(f"--{name}", nargs="+", type=int, default=None)
            else:
                pg.add_argument(f"--{name}", type=type(value), default=None)


def from_args(args: Namespace, base: Optional[Config] = None) -> Config:
    cfg = base or Config()
    updates = {k: v for k, v in vars(args).items() if v is not None}
    for gname in _GROUPS:
        group = getattr(cfg, gname)
        if dataclasses.is_dataclass(group):
            names = {f.name for f in dataclasses.fields(group)}
            kw = {k: v for k, v in updates.items() if k in names}
            if kw:
                setattr(cfg, gname, dataclasses.replace(group, **kw))
        else:  # NamedTuple (RasterConfig is a frozen dataclass; GIParams NT)
            names = set(group._fields)
            kw = {k: v for k, v in updates.items() if k in names}
            if kw:
                setattr(cfg, gname, group._replace(**kw))
    return cfg


def save_cfg(cfg: Config, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    out = {}
    for gname in _GROUPS:
        g = getattr(cfg, gname)
        out[gname] = dataclasses.asdict(g) if dataclasses.is_dataclass(g) \
            else g._asdict()
    with open(os.path.join(path, "cfg_args.json"), "w") as f:
        json.dump(out, f, indent=2)


def load_cfg(path: str, base: Optional[Config] = None) -> Config:
    cfg = base or Config()
    with open(os.path.join(path, "cfg_args.json")) as f:
        data = json.load(f)
    for gname in _GROUPS:
        if gname not in data:
            continue
        g = getattr(cfg, gname)
        if dataclasses.is_dataclass(g):
            setattr(cfg, gname, dataclasses.replace(g, **data[gname]))
        else:
            setattr(cfg, gname, g._replace(**data[gname]))
    return cfg
