# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Config system: YAML files + dot-path CLI overrides.

Mirrors the reference's fvcore-CfgNode usage (reference: ddp-train.py:592-595;
README documents ``--opts train.x=y`` style overrides) with a small
attribute-dict implementation (fvcore is not a dependency).
"""

from __future__ import annotations

import ast
import logging
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """Nested dict with attribute access and dot-path merging."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def from_nested(cls, d: Dict[str, Any]) -> "Config":
        out = cls()
        for k, v in d.items():
            out[k] = cls.from_nested(v) if isinstance(v, dict) else v
        return out

    def merge_dotted(self, overrides: List[str]) -> "Config":
        """Apply ["a.b.c=value", ...] or ["a.b.c", "value", ...] overrides."""
        pairs: List[tuple] = []
        i = 0
        while i < len(overrides):
            if "=" in overrides[i]:
                k, v = overrides[i].split("=", 1)
                pairs.append((k, v))
                i += 1
            else:
                pairs.append((overrides[i], overrides[i + 1]))
                i += 2
        for key, raw in pairs:
            node = self
            parts = key.split(".")
            known = True
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], dict):
                    node[p] = Config()
                    known = False
                node = node[p]
            if known and parts[-1] not in node:
                known = False
            if not known:
                # A typo'd override (train.outdir=...) would otherwise be a
                # silent no-op: the key is created but nothing reads it.
                logging.warning(
                    "config override %r creates a new key not present in the "
                    "YAML — check for a typo (e.g. progress.output_path, not "
                    "outdir)",
                    key,
                )
            try:
                val = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                try:
                    # YAML scalars: false/true/null/1e-3 (a bare "false" is
                    # not a Python literal and must not survive as a string)
                    val = yaml.safe_load(raw)
                except yaml.YAMLError:
                    val = raw
            node[parts[-1]] = val
        return self

    def to_dict(self) -> Dict[str, Any]:
        return {
            k: v.to_dict() if isinstance(v, Config) else v for k, v in self.items()
        }


def load_config(path: str, overrides: Optional[List[str]] = None) -> Config:
    with open(path, "r") as f:
        cfg = Config.from_nested(yaml.safe_load(f))
    if overrides:
        cfg.merge_dotted(overrides)
    return cfg
