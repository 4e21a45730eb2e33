"""Dataset module registry.

Mirrors the reference contract (/root/reference/atlite/datasets/__init__.py
and era5.py:45-62): each module exposes ``crs``, ``features`` (feature ->
list of variables), ``static_features`` and ``get_data(cutout, feature,
**params)``.

``synthetic`` is this framework's deterministic offline weather generator —
the primary test/benchmark data source (no network, bit-reproducible).
"""

from atlite_tpu.datasets import era5, gebco, sarah, synthetic

modules = {
    "era5": era5,
    "sarah": sarah,
    "gebco": gebco,
    "synthetic": synthetic,
}
