"""Experiment results store: argument-hash memoization + CSV + manifest.

Covers the reference's ``examples/common/results.py:8-59``: runs are keyed
by the md5 of their sorted-JSON argparse namespace, results land in one CSV
per key plus an append-only ``manifest.csv``, and ``load_matching`` scans
all result CSVs row-filtering on the intersection of columns.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd

_EXCLUDED = {"func", "verbosity", "plot_x", "plot_y", "plot_title", "plot_x_label",
             "plot_y_label", "plot_x_type", "plot_y_type", "plot_legend",
             "plot_height", "plot_width", "plot_type", "plot_fontsize",
             "plot_toolbar", "summarize", "groupby", "plot_out"}


def _namespace_dict(arguments) -> dict:
    d = {k: v for k, v in vars(arguments).items() if k not in _EXCLUDED}
    return d


def hash_namespace(arguments) -> str:
    """md5 of the sorted-JSON namespace (reference results.py:8-11)."""
    s = json.dumps(_namespace_dict(arguments), sort_keys=True, default=str)
    return hashlib.md5(s.encode()).hexdigest()


def _folder(arguments) -> str:
    return getattr(arguments, "results_folder", "results/")


def check_exists(arguments) -> bool:
    """Skip duplicate runs (reference results.py:13-17)."""
    return os.path.exists(os.path.join(_folder(arguments), hash_namespace(arguments) + ".csv"))


def save(arguments, **kwargs) -> str:
    """One CSV per arg-hash (columns = namespace values + result arrays) and
    an appended manifest row (reference results.py:38-59)."""
    folder = _folder(arguments)
    os.makedirs(folder, exist_ok=True)
    h = hash_namespace(arguments)
    ns = _namespace_dict(arguments)

    arrays = {k: np.atleast_1d(np.asarray(v)) for k, v in kwargs.items()}
    lengths = {a.shape[0] for a in arrays.values()}
    if len(lengths) > 1:
        raise ValueError(f"result arrays have mismatched lengths: "
                         f"{ {k: v.shape for k, v in arrays.items()} }")
    n = lengths.pop() if lengths else 1

    df = pd.DataFrame({k: [v] * n for k, v in ns.items()})
    for k, v in arrays.items():
        if v.ndim > 1:
            v = v.reshape(n, -1).tolist()
        df[k] = list(v)
    path = os.path.join(folder, h + ".csv")
    df.to_csv(path, index=False)

    manifest = os.path.join(folder, "manifest.csv")
    row = pd.DataFrame([{**ns, "hash": h}])
    if os.path.exists(manifest):
        # column-aligned append (namespaces can differ across experiments)
        row = pd.concat([pd.read_csv(manifest), row], ignore_index=True)
    row.to_csv(manifest, index=False)
    return path


def load_matching(to_match, folder: str | None = None) -> pd.DataFrame | None:
    """Scan result CSVs; keep rows whose shared columns match ``to_match``
    (reference results.py:19-36)."""
    if not isinstance(to_match, dict):
        to_match = _namespace_dict(to_match)
    folder = folder or to_match.get("results_folder", "results/")
    if not os.path.isdir(folder):
        return None
    frames = []
    for fn in sorted(os.listdir(folder)):
        if not fn.endswith(".csv") or fn == "manifest.csv":
            continue
        df = pd.read_csv(os.path.join(folder, fn))
        keep = np.ones(len(df), dtype=bool)
        for k, v in to_match.items():
            if k in df.columns and v is not None:
                keep &= (df[k].astype(str) == str(v)).to_numpy()
        if keep.any():
            frames.append(df[keep])
    if not frames:
        return None
    return pd.concat(frames, ignore_index=True)
