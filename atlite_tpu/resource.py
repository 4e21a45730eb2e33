"""Turbine / solar-panel / CSP-installation configuration registry.

Parity with /root/reference/atlite/resource.py:50-518: yaml-backed configs
with dotted-access registries, turbine power-curve validation (monotone wind
speeds, optional auto cut-out speed), gaussian power-curve smoothing, and
the OEDB online turbine download.

The shipped resource data files carry the reference distribution's measured
data tables (CC-BY-4.0/CC0, re-emitted with attribution by
tools/import_reference_resources.py — see resources/README.md), so named
configs produce the reference's numbers.
"""

from __future__ import annotations

import json
import logging
import re
from pathlib import Path

import numpy as np
import yaml

logger = logging.getLogger(__name__)

RESOURCE_DIRECTORY = Path(__file__).parent / "resources"
WINDTURBINE_DIRECTORY = RESOURCE_DIRECTORY / "windturbine"
SOLARPANEL_DIRECTORY = RESOURCE_DIRECTORY / "solarpanel"
CSPINSTALLATION_DIRECTORY = RESOURCE_DIRECTORY / "cspinstallation"


class arrowdict(dict):
    """dict with attribute ("arrow") access to keys (reference utils.py:104)."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as exc:
            raise AttributeError(key) from exc

    def __dir__(self):
        return list(super().__dir__()) + list(self)


def get_windturbineconfig(turbine, add_cutout_windspeed=True):
    """Load and validate a turbine config (resource.py:50-109)."""
    if not isinstance(turbine, (str, Path, dict)):
        raise KeyError(
            f"`turbine` must be a str, pathlib.Path or dict, but is {type(turbine)}."
        )
    if isinstance(turbine, str) and turbine.startswith("oedb:"):
        conf = get_oedb_windturbineconfig(turbine[len("oedb:"):])
    elif isinstance(turbine, (str, Path)):
        path = (windturbines[str(turbine).replace(".yaml", "")]
                if isinstance(turbine, str) else turbine)
        if isinstance(path, dict):
            # OEDB downloads register the config dict itself under the
            # turbine's name (resource.py:505-507) — honor those entries
            # instead of trying to open() a dict
            conf = dict(path)
        else:
            with open(path) as f:
                raw = yaml.safe_load(f)
            conf = dict(
                V=np.array(raw["V"], dtype=float),
                POW=np.array(raw["POW"], dtype=float),
                hub_height=raw["HUB_HEIGHT"],
                P=float(np.max(raw["POW"])),
            )
    else:
        conf = turbine
    return _validate_turbine_config_dict(conf, add_cutout_windspeed)


def get_solarpanelconfig(panel):
    """Load a panel config (resource.py:112-141)."""
    assert isinstance(panel, (str, Path))
    path = (solarpanels[str(panel).replace(".yaml", "")]
            if isinstance(panel, str) else panel)
    with open(path) as f:
        return yaml.safe_load(f)


def get_cspinstallationconfig(installation):
    """Load a CSP installation config (resource.py:144-201).

    The efficiency table is exposed for the device kernel as three arrays:
    ``efficiency_altitude`` / ``efficiency_azimuth`` (rad, ascending) and
    ``efficiency_table`` (altitude x azimuth, p.u.).
    """
    assert isinstance(installation, (str, Path))
    path = (cspinstallations[str(installation).replace(".yaml", "")]
            if isinstance(installation, str) else installation)
    with open(path) as f:
        config = yaml.safe_load(f)
    config["path"] = path

    eff = config["efficiency"]
    if isinstance(eff["altitude"], dict):
        # reference-format files store pandas to_dict() output:
        # {altitude: {row: deg}, ...} (reference resource.py:176-178)
        rows = sorted(eff["altitude"])
        eff = {k: [eff[k][r] for r in rows] for k in ("altitude", "azimuth", "value")}
    alt = np.asarray(eff["altitude"], dtype=float)  # deg
    azi = np.asarray(eff["azimuth"], dtype=float)  # deg
    val = np.asarray(eff["value"], dtype=float)
    alt_u = np.unique(alt)
    azi_u = np.unique(azi)
    table = np.full((len(alt_u), len(azi_u)), np.nan)
    ia = np.searchsorted(alt_u, alt)
    iz = np.searchsorted(azi_u, azi)
    table[ia, iz] = val
    config["efficiency_altitude"] = np.radians(alt_u)
    config["efficiency_azimuth"] = np.radians(azi_u)
    config["efficiency_table"] = table / 100.0  # % -> p.u.
    return config


def solarpanel_rated_capacity_per_unit(panel):
    """resource.py:204-217."""
    if isinstance(panel, (str, Path)):
        panel = get_solarpanelconfig(panel)
    model = panel.get("model", "huld")
    if model == "huld":
        return panel["efficiency"]
    if model == "bofinger":
        A, B, C = panel["A"], panel["B"], panel["C"]
        return (A + B * 1000.0 + C * np.log(1000.0)) * 1e3
    raise ValueError(model)


def windturbine_rated_capacity_per_unit(turbine):
    if isinstance(turbine, (str, Path)):
        turbine = get_windturbineconfig(turbine)
    return turbine["P"]


def windturbine_smooth(turbine, params=None):
    """Gaussian-kernel power-curve smoothing (resource.py:227-297)."""
    if params is None or params is True:
        params = {}
    eta = params.get("eta", 0.95)
    Delta_v = params.get("Delta_v", 1.27)
    sigma = params.get("sigma", 2.29)

    def kernel(v0):
        return (1.0 / np.sqrt(2 * np.pi * sigma * sigma)
                * np.exp(-(v0 - Delta_v) ** 2 / (2 * sigma * sigma)))

    velocities_reg = np.linspace(-50.0, 50.0, 1001)
    power_reg = np.interp(velocities_reg, turbine["V"], turbine["POW"])
    kernel_reg = kernel(velocities_reg)
    # direct convolution on the 0.1 m/s grid (the reference's fftconvolve
    # with a 0.1 rescale, resource.py:267-277)
    convolution = 0.1 * np.convolve(power_reg, kernel_reg, mode="same")
    velocities_new = np.linspace(0.0, 35.0, 72)
    power_new = eta * np.interp(velocities_new, velocities_reg, convolution)

    turbine = dict(turbine)
    turbine["V"], turbine["POW"] = velocities_new, power_new
    turbine["P"] = np.max(power_new)

    if np.any(turbine["POW"][turbine["V"] == 0.0] > 1e-2):
        logger.warning(
            "Oversmoothing detected with parameters eta=%f, Delta_v=%f, "
            "sigma=%f. Turbine generates energy at 0 m/s wind speeds.",
            eta, Delta_v, sigma,
        )
    return turbine


def _max_v_is_zero_pow(turbine):
    return np.any(turbine["POW"][turbine["V"] == turbine["V"].max()] == 0)


def _validate_turbine_config_dict(turbine, add_cutout_windspeed):
    """Validate curve shape and monotonicity (resource.py:304-372)."""
    if not all(k in turbine for k in ("POW", "V", "P", "hub_height")):
        raise ValueError(
            "turbine config dict needs at least the following keys: "
            f"['POW', 'V', 'P', 'hub_height'] but are currently: "
            f"{list(turbine.keys())}"
        )
    if not all(isinstance(turbine[p], (np.ndarray, list)) for p in ("POW", "V")):
        raise ValueError("turbine entries 'POW' and 'V' must be np.ndarray or list")
    turbine = dict(turbine)
    turbine["V"] = np.asarray(turbine["V"], dtype=float)
    turbine["POW"] = np.asarray(turbine["POW"], dtype=float)
    if len(turbine["POW"]) != len(turbine["V"]):
        raise ValueError("turbine wind speed and power arrays do not have equal length.")
    if not np.all(np.diff(turbine["V"]) >= 0):
        raise ValueError(
            "wind speed 'V' in the turbine config dict is expected to be "
            f"increasing, but is currently not in ascending order:\n{turbine['V']}"
        )
    if add_cutout_windspeed is True and not _max_v_is_zero_pow(turbine):
        turbine["V"] = np.pad(turbine["V"], (0, 1), "maximum")
        turbine["POW"] = np.pad(turbine["POW"], (0, 1), constant_values=0)
        logger.info(
            "adding a cut-out wind speed to the turbine power curve at "
            f"V={turbine['V'][-1]} m/s."
        )
    if not _max_v_is_zero_pow(turbine):
        logger.warning(
            "The power curve does not have a cut-out wind speed, i.e. the "
            "power output corresponding to the highest wind speed is not "
            "zero. You can either change the power curve manually or set "
            "'add_cutout_windspeed=True' in the Cutout.wind conversion method."
        )
    return turbine


def get_oedb_windturbineconfig(search=None, **search_params):
    """Download a turbine config from the OEDB database (resource.py:375-509)."""
    try:
        import requests
    except ImportError as exc:
        raise ImportError("OEDB turbine download requires 'requests'") from exc

    if isinstance(search, int):
        search_params.setdefault("id", search)
        search = None

    OEDB_URL = ("https://openenergy-platform.org/api/v0/schema/supply/tables/"
                "wind_turbine_library/rows")
    global _oedb_turbines
    if _oedb_turbines is None:
        import pandas as pd

        result = requests.get(OEDB_URL, timeout=60.0)
        df = pd.DataFrame.from_dict(result.json())
        _oedb_turbines = df[df.has_power_curve]

    df = _oedb_turbines
    selector = np.ones(len(df), dtype=bool)
    if search is not None:
        selector &= (df.name.str.contains(search, case=False)
                     | df.turbine_type.str.contains(search, case=False))
    if "id" in search_params:
        selector &= df.id == int(search_params["id"])
    if "name" in search_params:
        selector &= df.name.str.contains(search_params["name"], case=False)
    if "turbine_type" in search_params:
        # (the reference reads search_params['name'] here — a copy-paste
        # bug, resource.py:448 — fixed deliberately)
        selector &= df.turbine_type.str.contains(search_params["turbine_type"],
                                                 case=False)
    if "manufacturer" in search_params:
        selector &= df.manufacturer.str.contains(search_params["manufacturer"], case=False)
    df = df.loc[selector]
    if len(df) < 1:
        raise RuntimeError("No turbine found.")
    if len(df) > 1:
        raise RuntimeError(
            f"Provided information corresponds to {len(df)} turbines, use "
            "`id` for an unambiguous search.\n"
            + str(df[["id", "manufacturer", "turbine_type"]])
        )
    ds = df.iloc[0]
    power = np.array(json.loads(ds.power_curve_values)) / 1e3  # kW -> MW
    hub_height = ds.hub_height
    if not hub_height:
        hub_height = 100
        logger.warning("No hub_height defined in dataset; assuming 100 m.")
    elif isinstance(hub_height, str):
        hh = [float(t) for t in re.split(r"\s*;\s*", hub_height.strip()) if t]
        # reference takes the INT mean of multi-value heights
        # (resource.py:485, np.mean(..., dtype=int)) — match it so wind
        # CFs agree for OEDB turbines like '98;103' -> 100 m
        hub_height = float(np.mean(hh, dtype=int)) if len(hh) > 1 else hh[0]
    conf = {
        "name": ds.turbine_type.strip(),
        "manufacturer": ds.manufacturer.strip(),
        "source": f"Original: {ds.source}. Via OEDB {OEDB_URL}",
        "hub_height": hub_height,
        "V": np.array(json.loads(ds.power_curve_wind_speeds)),
        "POW": power,
        "P": power.max(),
    }
    charmap = str.maketrans("/- ", "___")
    windturbines["{manufacturer}_{name}".format(**conf).translate(charmap)] = conf
    return conf


_oedb_turbines = None
windturbines = arrowdict({p.stem: p for p in sorted(WINDTURBINE_DIRECTORY.glob("*.yaml"))})
solarpanels = arrowdict({p.stem: p for p in sorted(SOLARPANEL_DIRECTORY.glob("*.yaml"))})
cspinstallations = arrowdict(
    {p.stem: p for p in sorted(CSPINSTALLATION_DIRECTORY.glob("*.yaml"))}
)
