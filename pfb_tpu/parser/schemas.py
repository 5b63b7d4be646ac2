"""Worker parameter schemas.

The reference builds per-worker schemas from YAML files with scabha/
omegaconf (pfb/parser/schemas.py:18-39) and clickifies them onto each
worker. Here the same shape is kept with plain PyYAML: every
``pfb_tpu/parser/<worker>.yaml`` holds ``inputs: {name: {dtype, default,
info, abbreviation}}``; :data:`schema` exposes them as attribute-style
objects, and :func:`defaults_for` produces the kwargs dict workers and
tests consume (the reference's tests build args the same way,
tests/test_klean.py:183-195 upstream).
"""

import glob
import os
from types import SimpleNamespace

import yaml

_here = os.path.dirname(__file__)


class _Schema(SimpleNamespace):
    def __getitem__(self, key):
        return getattr(self, key)


def _load():
    out = {}
    for path in sorted(glob.glob(os.path.join(_here, "*.yaml"))):
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path) as f:
            spec = yaml.safe_load(f) or {}
        inputs = spec.get("inputs") or {}
        # shared option mixins (reference: pfb/parser/*.yml included
        # via scabha's _include): a worker yaml lists mixin .yml files
        # under inputs._include; mixin options merge in but the
        # worker's own definitions win
        include = inputs.pop("_include", None) or []
        if isinstance(include, str):
            include = [include]
        merged = {}
        for mixin in include:
            with open(os.path.join(_here, mixin)) as f:
                merged.update(yaml.safe_load(f) or {})
        merged.update(inputs)
        if merged:
            spec["inputs"] = merged
        out[name] = spec
    return _Schema(**out)


schema = _load()


def defaults_for(worker: str) -> dict:
    """kwargs dict of defaults for a worker, '-' replaced by '_'."""
    spec = getattr(schema, worker)
    out = {}
    for key, field in spec.get("inputs", {}).items():
        out[key.replace("-", "_")] = field.get("default")
    return out
