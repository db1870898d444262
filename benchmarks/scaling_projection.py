"""Fit the α-β comm model and emit the DCN weak-scaling projection.

Usage:  python benchmarks/scaling_projection.py [--out SCALING_r05.json]

Reads the 2-process loopback mesh artifact (MULTIHOST2P_r04.json),
fits per-message latency α from its per-level halo-only times,
validates the fit against the same measurements, then projects 2-host
weak scaling under public v5p interconnect presets (ici / dcn) with the
deep-tail policy chosen per level by the model
(wavelets_tpu.parallel.costmodel).  No device required.

BASELINE.json target: ≥90% weak-scaling efficiency at 2 hosts — the
projection states whether the model clears it and on which transport.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from wavelets_tpu.parallel.costmodel import (  # noqa: E402
    SCENARIOS, Scenario, fit_alpha_beta, project, tail_switch_level)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r05.json")
    ap.add_argument("--artifact", default="MULTIHOST2P_r04.json")
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    with open(os.path.join(root, args.artifact)) as f:
        mh = json.load(f)
    levels = mh["timing"]["levels"]
    n = mh["timing"]["n"]
    itemsize = 8 if mh["timing"]["dtype"] == "float64" else 4
    halo_rows = 4                     # cdf97 lifting reach (2 steps x 1)

    alpha, beta, resid = fit_alpha_beta(levels, n, itemsize, halo_rows)
    fit = {
        "transport": mh["timing"]["transport"],
        "alpha_ms_per_message": alpha * 1e3,
        "beta_fit": (None if beta is None else beta / 1e9),
        "beta_note": ("constant-size halo messages leave beta "
                      "unidentifiable from this artifact; projections "
                      "use preset transport bandwidths"),
        "residual_ms": [r * 1e3 for r in resid],
        "residual_rms_ms": (sum(r * r for r in resid)
                            / len(resid)) ** 0.5 * 1e3,
        "validation": [
            # the FITTED model only (α; β is unidentifiable from the
            # constant-size halo messages, so no bandwidth term is
            # invented here — mixing in a preset β misrepresented the
            # fit, code-review r5); residual_ms above is measured minus
            # this same quantity
            {"level": lv["level"],
             "measured_halo_ms": lv["t_halo_only_ms"],
             "model_halo_ms": 2 * alpha * 1e3}
            for lv in levels],
    }

    # projections: 16k f32 cdf97 per host, 8 levels, 2 hosts rows-sharded
    m_single, n_cols, L, sz = 16384, 16384, 8, 4
    out = {"fit_loopback": fit, "projections": {}}
    for name, sc in SCENARIOS.items():
        # weak scaling: global rows = nd * per-host rows
        weak = project(2 * m_single, n_cols, L, sz, halo_rows, 2, sc)
        strong = project(m_single, n_cols, L, sz, halo_rows, 2, sc)
        strong["note"] = ("strong-scaling view of the BASELINE 16k image "
                          "split over 2 hosts (same formulae; "
                          "'efficiency' field reads as parallel "
                          "efficiency vs one host doing half the rows)")
        out["projections"][name] = {"weak_2host": weak,
                                    "strong_16k_2host": strong}
    # the loopback scenario itself, as the closable validation loop:
    # alpha from the fit, beta pessimistic loopback-TCP class
    loop = Scenario("loopback_fit", alpha_s=alpha, beta_Bps=2e9,
                    hbm_Bps=6e9)   # CPU-mesh compute class, not TPU
    out["projections"]["loopback_fit"] = {
        "weak_2host": project(2 * 2048, 2048, 6, 8, halo_rows, 2, loop),
        "note": ("same model instantiated at the loopback mesh's own "
                 "scale (n=2048 f64 L6) for qualitative comparison with "
                 "the measured comm fractions")}
    bar = out["projections"]["dcn"]["weak_2host"]["weak_scaling_efficiency"]
    out["baseline_bar"] = {
        "target": 0.90,
        "projected_dcn_weak_2host": bar,
        "projected_ici_weak_2host":
            out["projections"]["ici"]["weak_2host"]
               ["weak_scaling_efficiency"],
        "clears_on": [k for k in ("ici", "dcn")
                      if out["projections"][k]["weak_2host"]
                      ["weak_scaling_efficiency"] >= 0.90],
        "switch_levels": {k: out["projections"][k]["weak_2host"]
                          ["switch_level"] for k in ("ici", "dcn")},
        "env_override": "WAVELETS_TPU_SHARD_TAIL_LEVEL",
    }
    path = os.path.join(root, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["baseline_bar"], indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
