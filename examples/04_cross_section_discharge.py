"""Cross-section velocities and river discharge.

Mirrors the reference tutorial
``04_Extracting_crosssection_velocities_and_discharge.ipynb``: sample a
masked velocimetry result over a surveyed cross-section, depth-integrate
to specific discharge q with a log-profile fill for unmeasured cells, and
integrate to river flow Q.

Run:  python examples/04_cross_section_discharge.py [output_dir]
"""

import os
import sys

NGWERERE = "/root/reference/examples/ngwerere"


def main(out_dir: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    import pyorc_tpu

    os.makedirs(out_dir, exist_ok=True)
    ds = pyorc_tpu.open_dataset(os.path.join(NGWERERE, "ngwerere_masked.nc"))
    cs = np.genfromtxt(os.path.join(NGWERERE, "ngwerere_cross_section.csv"), delimiter=",", names=True)

    tr = ds.velocimetry.get_transect(cs["x"], cs["y"], cs["z"], crs=32735, rolling=4, wdw=2)
    print(f"transect: {tr.sizes['points']} points, quantiles {tr['quantile'].values}")

    tr_q = tr.transect.get_q(fill_method="log_interp")
    tr_q.transect.get_river_flow()
    q_m = tr_q["river_flow"].sel(quantile=0.5)
    print(f"river flow Q (median): {float(q_m.values):.3f} m3/s")
    print(f"  quantile spread: {[round(float(v), 3) for v in tr_q['river_flow'].values]}")

    tr_q.velocimetry.set_encoding()
    out_nc = os.path.join(out_dir, "ngwerere_transect.nc")
    tr_q.to_netcdf(out_nc)
    print(f"wrote {out_nc}")

    # effective velocity along the section
    fig, ax = plt.subplots(figsize=(10, 5))
    v_eff = tr_q["v_eff"].sel(quantile=0.5).values
    ax.plot(np.asarray(tr_q["scoords"].values), v_eff, "o-", label="v_eff (median)")
    ax.set_xlabel("distance along section [m]")
    ax.set_ylabel("effective velocity [m/s]")
    ax.legend()
    fn = os.path.join(out_dir, "v_eff_section.png")
    fig.savefig(fn, dpi=90)
    plt.close(fig)
    print(f"  {fn}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pyorc_tpu_example04")
