"""Configuration tree — dataclass equivalent of the reference argparse groups.

Defaults reproduce `/root/reference/arguments/__init__.py:47-97` exactly (the
reproduction baseline); shell-script overrides (1,200/2,000 iterations,
`--motion_offset_flag --smpl_type smpl`) are applied by the CLI entry points.
Configs serialize to JSON alongside checkpoints (replaces the reference's
`cfg_args` Namespace text file, arguments/__init__.py:99-119).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    white_background: bool = False
    eval: bool = False
    exp_name: str = ""
    smpl_type: str = "smpl"          # scripts pass --smpl_type smpl
    actor_gender: str = "neutral"
    motion_offset_flag: bool = True  # scripts pass --motion_offset_flag


@dataclass
class PipelineConfig:
    # The fused rasterizer always precomputes cov3D + SH colors in-graph
    # (reference defaults convert_SHs_python=True, compute_cov3D_python=True).
    tile_w: int = 16
    tile_h: int = 16
    max_tiles_per_gaussian: int = 16
    tile_capacity: int = 1024
    chunk_tiles: int = 64
    use_pallas: bool = True          # Pallas blend kernel on TPU; jnp fallback


@dataclass
class OptimizationConfig:
    iterations: int = 1200           # train_zju_mocap_refine.sh:4 budget
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    pose_refine_lr: float = 0.00005
    lbs_offset_lr: float = 0.00005
    normal_lr: float = 0.0002
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 400
    densify_until_iter: int = 2000
    pbr_iteration: int = 30_000      # train.py:131 hard-codes 30000
    densify_grad_threshold: float = 0.0002
    use_kl_densify: bool = False     # paper's KL gating (ref ships, disables)
    kl_threshold: float = 0.4
    smpl_prune_threshold: float = 0.05
    adam_eps: float = 1e-15          # gaussian_model.py:284
    # PBR-phase loss weights (train.py:294-363)
    lambda_lpips: float = 0.01
    lambda_normal: float = 1.0
    lambda_mask: float = 0.1


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    optim: OptimizationConfig = field(default_factory=OptimizationConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        d = json.loads(text)
        return cls(
            model=ModelConfig(**d.get("model", {})),
            pipeline=PipelineConfig(**d.get("pipeline", {})),
            optim=OptimizationConfig(**d.get("optim", {})),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_json(f.read())
