"""Generate the shipped resource data files (turbines, panels, CSP).

All data here is synthesized by this project:
- wind power curves come from a standard parametric turbine model
  (cubic ramp between cut-in and rated speed, logistic smoothing near
  rated, zero beyond cut-out), with nameplate specs (rated power, rotor
  class, hub height, cut-in/rated/cut-out speeds) chosen per config,
- PV panel configs use the published Huld et al. (2010) model coefficients
  for crystalline-Si and CdTe modules (model constants from the paper),
- CSP installation efficiency tables come from a cosine-effectiveness
  heliostat/trough field model.

Run:  python tools/generate_resources.py
"""

from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent / "atlite_tpu" / "resources"


def power_curve(v_cutin, v_rated, v_cutout, p_rated, smooth=0.6):
    """Parametric power curve. Cubic in wind speed up to rated with a
    logistic knee of width `smooth` m/s, constant to cut-out, then zero."""
    V = np.concatenate([
        np.arange(0.0, v_cutout + 0.5, 0.5),
        [v_cutout, v_cutout + 0.01],
    ])
    V = np.unique(np.round(V, 3))
    cubic = np.clip((V**3 - v_cutin**3) / (v_rated**3 - v_cutin**3), 0, None)
    knee = 1.0 / (1.0 + np.exp(-(v_rated - V) / smooth))
    pow_ = p_rated * np.where(V < v_cutin, 0.0, np.minimum(cubic * knee + (1 - knee), 1.0))
    pow_[V > v_cutout] = 0.0
    pow_[V >= v_cutout] = 0.0
    return V, np.round(pow_, 4)


TURBINES = {
    # name: (hub_height, v_cutin, v_rated, v_cutout, p_rated_MW)
    # Nameplate specs (hub height, cut-in/rated/cut-out speed, rated power)
    # are public manufacturer facts; the curves between them are synthesized
    # by the parametric model above.
    "Vestas_V112_3MW": (80.0, 3.0, 12.5, 25.0, 3.0),
    "Vestas_V112_3MW_offshore": (94.0, 3.0, 12.5, 25.0, 3.075),
    "Vestas_V90_3MW": (80.0, 3.5, 15.0, 25.0, 3.0),
    "Vestas_V80_2MW_gridstreamer": (80.0, 4.0, 15.0, 25.0, 2.0),
    "Vestas_V66_1750kW": (67.0, 4.0, 16.0, 25.0, 1.75),
    "Vestas_V47_660kW": (50.0, 4.0, 15.5, 25.0, 0.66),
    "Vestas_V25_200kW": (30.0, 3.5, 13.5, 25.0, 0.2),
    "Vestas_V164_7MW_offshore": (105.0, 4.0, 13.0, 25.0, 7.0),
    "Siemens_SWT_2300kW": (80.0, 3.5, 13.5, 25.0, 2.3),
    "Siemens_SWT_107_3600kW": (90.0, 3.5, 13.5, 25.0, 3.6),
    "Enercon_E101_3000kW": (99.0, 2.0, 13.0, 25.0, 3.05),
    "Enercon_E82_3000kW": (78.0, 2.5, 16.0, 25.0, 3.0),
    "Enercon_E126_7500kW": (135.0, 3.0, 16.5, 25.0, 7.58),
    "NREL_ReferenceTurbine_5MW_offshore": (90.0, 3.0, 11.4, 25.0, 5.0),
    "NREL_ReferenceTurbine_2016CACost_6MW_offshore": (100.0, 4.0, 12.5, 25.0, 6.0),
    "NREL_ReferenceTurbine_2016CACost_8MW_offshore": (110.0, 4.0, 12.5, 25.0, 8.0),
    "NREL_ReferenceTurbine_2016CACost_10MW_offshore": (125.0, 4.0, 11.5, 25.0, 10.0),
    "NREL_ReferenceTurbine_2019ORCost_12MW_offshore": (136.0, 3.0, 11.0, 25.0, 12.0),
    "NREL_ReferenceTurbine_2019ORCost_15MW_offshore": (150.0, 3.0, 10.8, 25.0, 15.0),
    "NREL_ReferenceTurbine_2020ATB_4MW": (110.0, 3.25, 9.8, 25.0, 4.0),
    "NREL_ReferenceTurbine_2020ATB_5.5MW": (120.0, 3.25, 10.0, 25.0, 5.5),
    "NREL_ReferenceTurbine_2020ATB_7MW": (130.0, 3.25, 10.3, 25.0, 7.0),
    "NREL_ReferenceTurbine_2020ATB_12MW_offshore": (136.0, 3.0, 10.9, 25.0, 12.0),
    "NREL_ReferenceTurbine_2020ATB_15MW_offshore": (150.0, 3.0, 10.6, 25.0, 15.0),
    "NREL_ReferenceTurbine_2020ATB_18MW_offshore": (156.0, 3.0, 10.4, 25.0, 18.0),
    "Bonus_B1000_1000kW": (50.0, 3.0, 15.0, 25.0, 1.0),
    "Suzlon_S82_1.5_MW": (78.0, 4.0, 14.0, 20.0, 1.5),
    "Nordex_N131_3000kW": (99.0, 3.0, 11.5, 20.0, 3.0),
}

# Path-only configs shipped without the .yaml suffix (the reference ships
# eno_126_* the same way: excluded from the registry glob, loadable via an
# explicit path — reference resource.py:514 globs "*.yaml" only).
TURBINES_NO_SUFFIX = {
    "eno_126_3.5": (117.0, 3.0, 12.5, 25.0, 3.5),
    "eno_126_4": (117.0, 3.0, 13.0, 25.0, 4.0),
    "eno_126_4.8": (117.0, 3.0, 13.5, 25.0, 4.8),
}


def write_turbines():
    outdir = ROOT / "windturbine"
    outdir.mkdir(parents=True, exist_ok=True)
    entries = [(f"{name}.yaml", spec) for name, spec in TURBINES.items()]
    entries += [(name, spec) for name, spec in TURBINES_NO_SUFFIX.items()]
    for fname, (hub, vci, vr, vco, p) in entries:
        name = fname.replace(".yaml", "")
        V, POW = power_curve(vci, vr, vco, p)
        lines = [
            f"# {name}: synthesized parametric power curve",
            "# (cubic-ramp/logistic-knee model, tools/generate_resources.py;",
            "#  NOT manufacturer data — refit before production use)",
            f"name: {name.replace('_', ' ')}",
            "manufacturer: generic",
            "source: atlite_tpu parametric turbine model",
            f"HUB_HEIGHT: {hub}",
            "V: [" + ", ".join(f"{v:g}" for v in V) + "]",
            "POW: [" + ", ".join(f"{w:g}" for w in POW) + "]",
        ]
        (outdir / fname).write_text("\n".join(lines) + "\n")


# NOTE: all temperatures below are in KELVIN — converters feed raw
# reanalysis temperature (K) into the panel models, so reference
# temperatures must be Kelvin too.
PANELS = {
    # Huld et al. 2010 model coefficients (published model constants)
    "CSi": dict(
        model="huld", name="Crystalline silicon", source="Huld et al. (2010)",
        efficiency=0.17, r_irradiance=1000.0, r_tamb=293.0, r_tmod=298.0,
        c_temp_amb=1.0, c_temp_irrad=0.035, inverter_efficiency=0.9,
        k_1=-0.017162, k_2=-0.040289, k_3=-0.004681, k_4=0.000148,
        k_5=0.000169, k_6=0.000005,
    ),
    "CdTe": dict(
        model="huld", name="Cadmium telluride", source="Huld et al. (2010)",
        efficiency=0.16, r_irradiance=1000.0, r_tamb=293.0, r_tmod=298.0,
        c_temp_amb=1.0, c_temp_irrad=0.035, inverter_efficiency=0.9,
        k_1=-0.103251, k_2=-0.040446, k_3=-0.001667, k_4=-0.002075,
        k_5=-0.001445, k_6=-0.000023,
    ),
    "KANENA": dict(
        model="bofinger", name="Bofinger reference module",
        source="atlite_tpu synthesized parameters (Beyer et al. 2004 model)",
        A=0.066, B=-4.4e-6, C=0.0122, D=-0.0035,
        NOCT=318.0, Tamb=293.0, Intc=800.0, Tstd=298.0, ta=0.9,
        threshold=1.0, inverter_efficiency=0.9,
    ),
}


def write_panels():
    import yaml

    outdir = ROOT / "solarpanel"
    outdir.mkdir(parents=True, exist_ok=True)
    for name, conf in PANELS.items():
        header = f"# {name} solar panel config (generated by tools/generate_resources.py)\n"
        (outdir / f"{name}.yaml").write_text(header + yaml.safe_dump(conf, sort_keys=False))


def csp_table(kind):
    """Cosine-effectiveness field efficiency on an (altitude, azimuth) grid."""
    alts = np.arange(0.0, 91.0, 5.0)
    azis = np.arange(0.0, 361.0, 15.0)
    rows = {"altitude": [], "azimuth": [], "value": []}
    for alt in alts:
        for azi in azis:
            a = np.radians(alt)
            z = np.radians(azi)
            if kind == "tower":
                # heliostat field: cosine losses vs sun elevation, slight
                # north-south asymmetry, atmospheric attenuation at low sun
                eff = 62.0 * np.sin(a) ** 0.55 * (1 - 0.08 * np.cos(z)) \
                    * (1 - np.exp(-(alt + 2.0) / 8.0))
            else:
                # trough with N-S axis: incidence-angle modifier on the
                # projection of the sun into the east-west plane
                proj = np.sqrt(1 - (np.cos(a) * np.cos(z - np.pi)) ** 2)
                eff = 70.0 * proj * np.sin(a) ** 0.12 if alt > 0 else 0.0
            rows["altitude"].append(float(alt))
            rows["azimuth"].append(float(azi))
            rows["value"].append(round(float(max(eff, 0.0)), 3))
    return rows


CSP = {
    "SAM_solar_tower": dict(
        name="Solar tower", technology="solar tower", r_irradiance=1000.0,
        source="atlite_tpu cosine-effectiveness field model",
        kind="tower",
    ),
    "SAM_parabolic_trough": dict(
        name="Parabolic trough", technology="parabolic trough",
        r_irradiance=950.0,
        source="atlite_tpu cosine-effectiveness field model",
        kind="trough",
    ),
    "lossless_installation": dict(
        name="Lossless installation", technology="solar tower",
        r_irradiance=1000.0, source="upper-bound reference installation",
        kind="lossless",
    ),
}


def write_csp():
    import yaml

    outdir = ROOT / "cspinstallation"
    outdir.mkdir(parents=True, exist_ok=True)
    for name, conf in CSP.items():
        conf = dict(conf)
        kind = conf.pop("kind")
        if kind == "lossless":
            alts = np.arange(0.0, 91.0, 5.0)
            azis = np.arange(0.0, 361.0, 15.0)
            rows = {"altitude": [], "azimuth": [], "value": []}
            for alt in alts:
                for azi in azis:
                    rows["altitude"].append(float(alt))
                    rows["azimuth"].append(float(azi))
                    rows["value"].append(100.0)
            conf["efficiency"] = rows
        else:
            conf["efficiency"] = csp_table(kind)
        header = f"# {name} CSP installation (generated by tools/generate_resources.py)\n"
        (outdir / f"{name}.yaml").write_text(header + yaml.safe_dump(conf, sort_keys=False))


if __name__ == "__main__":
    write_turbines()
    write_panels()
    write_csp()
    readme = ROOT / "README.md"
    readme.parent.mkdir(exist_ok=True)
    readme.write_text(
        "# Resource data\n\n"
        "All files are generated by `tools/generate_resources.py` from\n"
        "parametric models (wind power curves, CSP field-efficiency tables)\n"
        "or published model constants (Huld et al. 2010 PV coefficients).\n"
        "They are placeholders with realistic shapes — swap in measured\n"
        "curves (e.g. via `get_windturbineconfig(dict(...))`, a local yaml\n"
        "path, or `oedb:<name>`) for production studies.\n"
    )
    print("resources written to", ROOT)
