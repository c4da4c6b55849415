"""Config load/merge (reference S7 — annotator.py:97-114,
storage.py:104-121: OmegaConf yaml with precedence kwargs > cfg file >
class defaults, and an ``annotator:`` section unwrap).

Dependency-free port: plain dicts, same precedence, optional YAML-ish
flat file support (``key: value`` lines — full YAML needs pyyaml, which
we gate behind an import-try)."""

from __future__ import annotations

from dataclasses import asdict, fields
from typing import Any


def load_config_file(path: str) -> dict[str, Any]:
    try:
        import yaml  # type: ignore

        with open(path) as f:
            return yaml.safe_load(f) or {}
    except ImportError:
        out: dict[str, Any] = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or ":" not in line:
                    continue
                k, v = line.split(":", 1)
                v = v.strip()
                if v.isdigit():
                    out[k.strip()] = int(v)
                else:
                    try:
                        out[k.strip()] = float(v)
                    except ValueError:
                        out[k.strip()] = v
        return out


def merge_config(dataclass_type, cfg: dict[str, Any] | None = None, **kwargs):
    """Precedence: explicit kwargs > cfg dict > dataclass defaults
    (reference annotator.py:97-114). An ``annotator:`` section in cfg is
    unwrapped first (annotator.py:64-69). Unknown keys are ignored, as
    the reference's getattr-probing loop effectively does."""
    cfg = dict(cfg or {})
    if isinstance(cfg.get("annotator"), dict):
        inner = cfg.pop("annotator")
        cfg = {**cfg, **inner}
    valid = {f.name for f in fields(dataclass_type)}
    merged = {k: v for k, v in cfg.items() if k in valid}
    merged.update({k: v for k, v in kwargs.items() if k in valid and v is not None})
    return dataclass_type(**merged)


def dump_config(cfg_obj) -> dict[str, Any]:
    """parameters.yaml equivalent (reference storage.py:380-381)."""
    return asdict(cfg_obj)
