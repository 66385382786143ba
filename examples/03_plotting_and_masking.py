"""Masking and plotting velocimetry results.

Mirrors the reference tutorial ``03_Plotting_and_masking_velocimetry_results.ipynb``:
load a raw PIV result (the reference's shipped ngwerere output is used as
input so the example is bit-comparable), apply the standard mask chain,
reduce over time, and render the field in all three perspectives — local
(orthorectified metres), geographical (lon/lat), and camera (vectors
re-projected into the original video frame).

Run:  python examples/03_plotting_and_masking.py [output_dir]
"""

import os
import sys

NGWERERE = "/root/reference/examples/ngwerere"


def main(out_dir: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import pyorc_tpu

    os.makedirs(out_dir, exist_ok=True)
    ds = pyorc_tpu.open_dataset(os.path.join(NGWERERE, "ngwerere_piv.nc"))
    print(f"raw PIV: {dict(ds.sizes)}")

    # the ngwerere recipe's mask chain, applied in place
    m = ds.velocimetry.mask
    m.corr(inplace=True)
    m.minmax(inplace=True)
    m.rolling(inplace=True)
    m.outliers(inplace=True)
    m.variance(inplace=True)
    m.count(inplace=True)
    m.window_mean(wdw=2, tolerance=0.5, reduce_time=True, inplace=True)

    ds.velocimetry.set_encoding()
    out_nc = os.path.join(out_dir, "ngwerere_masked.nc")
    ds.to_netcdf(out_nc)
    print(f"wrote {out_nc}")

    # plotting requires a time-reduced field
    ds_mean = ds.mean(dim="time", keep_attrs=True)
    for mode in ("local", "geographical", "camera"):
        fig, ax = plt.subplots(figsize=(10, 7))
        ds_mean.velocimetry.plot(method="quiver", mode=mode, ax=ax, add_colorbar=True, scale=30)
        fn = os.path.join(out_dir, f"velocity_{mode}_quiver.png")
        fig.savefig(fn, dpi=90)
        plt.close(fig)
        print(f"  {fn}")

    fig, ax = plt.subplots(figsize=(10, 7))
    ds_mean.velocimetry.plot(method="pcolormesh", mode="local", ax=ax, add_colorbar=True)
    fn = os.path.join(out_dir, "velocity_local_pcolormesh.png")
    fig.savefig(fn, dpi=90)
    plt.close(fig)
    print(f"  {fn}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pyorc_tpu_example03")
