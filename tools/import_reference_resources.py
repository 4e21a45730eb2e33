"""Import the measured resource DATA tables from the reference atlite
distribution (/root/reference/atlite/resources), re-emitting them in this
project's yaml layout.

The reference data files are licensed CC-BY-4.0 / CC0 ("SPDX-License-
Identifier: CC-BY-4.0" headers, see e.g.
/root/reference/atlite/resources/windturbine/Vestas_V112_3MW.yaml:1-3).
Only the *data values* (power curves, hub heights, panel model constants,
CSP field-efficiency tables) are taken — they are measured/datasheet
constants with no copyrightable structure of the reference's code — and
every emitted file carries an attribution header naming the original
source.  This replaces the round-1 parametric placeholder curves so that
named turbines/panels produce the reference's numbers.

Run:  python tools/import_reference_resources.py
"""

from pathlib import Path

import numpy as np
import yaml

REF = Path("/root/reference/atlite/resources")
OUT = Path(__file__).resolve().parent.parent / "atlite_tpu" / "resources"

ATTRIB = (
    "# Data: Contributors to atlite <https://github.com/pypsa/atlite>,\n"
    "# redistributed under CC-BY-4.0 with attribution (original file:\n"
    "# atlite/resources/{rel}).  Values are measured datasheet /\n"
    "# model constants; see the 'source' field for the primary origin.\n"
)


def fmt_list(values, nd=None):
    def one(v):
        if nd is not None:
            v = round(float(v), nd)
        f = float(v)
        return str(int(f)) if f == int(f) else f"{f:g}"

    return "[" + ", ".join(one(v) for v in values) + "]"


def import_turbines():
    outdir = OUT / "windturbine"
    outdir.mkdir(parents=True, exist_ok=True)
    for path in sorted(REF.glob("windturbine/*")):
        raw = yaml.safe_load(path.read_text())
        lines = [ATTRIB.format(rel=f"windturbine/{path.name}")]
        for key in ("name", "manufacturer", "source"):
            if key in raw:
                lines.append(yaml.safe_dump({key: raw[key]}, width=1000).strip())
        lines.append(f"HUB_HEIGHT: {raw['HUB_HEIGHT']}")
        lines.append("V: " + fmt_list(raw["V"]))
        lines.append("POW: " + fmt_list(raw["POW"]))
        (outdir / path.name).write_text("\n".join(lines) + "\n")
    print("turbines:", len(list(REF.glob("windturbine/*"))))


def import_panels():
    outdir = OUT / "solarpanel"
    outdir.mkdir(parents=True, exist_ok=True)
    for path in sorted(REF.glob("solarpanel/*.yaml")):
        raw = yaml.safe_load(path.read_text())
        header = ATTRIB.format(rel=f"solarpanel/{path.name}")
        (outdir / path.name).write_text(
            header + yaml.safe_dump(raw, sort_keys=False, width=1000)
        )
    print("panels:", len(list(REF.glob("solarpanel/*.yaml"))))


def import_csp():
    outdir = OUT / "cspinstallation"
    outdir.mkdir(parents=True, exist_ok=True)
    for path in sorted(REF.glob("cspinstallation/*.yaml")):
        raw = yaml.safe_load(path.read_text())
        eff = raw.pop("efficiency")
        # reference files store the table as pandas to_dict() output:
        # {altitude: {row: deg}, azimuth: {row: deg}, value: {row: %}} —
        # normalize to parallel lists sorted by row index.
        if isinstance(eff["altitude"], dict):
            rows = sorted(eff["altitude"])
            alt = [eff["altitude"][r] for r in rows]
            azi = [eff["azimuth"][r] for r in rows]
            val = [eff["value"][r] for r in rows]
        else:
            alt, azi, val = eff["altitude"], eff["azimuth"], eff["value"]
        lines = [ATTRIB.format(rel=f"cspinstallation/{path.name}")]
        for key, v in raw.items():
            lines.append(yaml.safe_dump({key: v}, width=1000).strip())
        lines.append("efficiency:")
        lines.append("  altitude: " + fmt_list(alt))
        lines.append("  azimuth: " + fmt_list(azi))
        lines.append("  value: " + fmt_list(val, nd=6))
        (outdir / path.name).write_text("\n".join(lines) + "\n")
    print("csp:", len(list(REF.glob("cspinstallation/*.yaml"))))


def write_readme():
    (OUT / "README.md").write_text(
        "# Resource data\n\n"
        "Turbine power curves, PV panel model constants and CSP field-\n"
        "efficiency tables are the measured data tables shipped with the\n"
        "reference atlite distribution (CC-BY-4.0 / CC0; see the header of\n"
        "each file for the original path and primary source), re-emitted in\n"
        "this project's layout by `tools/import_reference_resources.py`.\n"
        "Named configs therefore produce the reference's numbers.\n\n"
        "`tools/generate_resources.py` (parametric placeholder generator)\n"
        "remains available for synthesizing additional curves.\n"
    )


if __name__ == "__main__":
    import_turbines()
    import_panels()
    import_csp()
    write_readme()
    print("resources written to", OUT)
