"""Offline data-engineering pipeline tests (FITS tiles + catalog -> h5 ->
combine -> dedup -> split -> probe sets), plus cluster queue dry runs."""

import os

import h5py
import numpy as np
import pytest

from sky_embeddings_tpu.cluster.queue_tpu import JobQueue, JobSpec
from sky_embeddings_tpu.data.fits_io import TanWCS, write_image
from sky_embeddings_tpu.data_processing.combine import combine_h5_files
from sky_embeddings_tpu.data_processing.create_h5 import (
    catalog_from_csv,
    create_h5_dataset,
)
from sky_embeddings_tpu.data_processing.dedup import deduplicate_h5, duplicate_mask
from sky_embeddings_tpu.data_processing.probe_sets import (
    make_probe_set,
    make_regression_probe_set,
)
from sky_embeddings_tpu.data_processing.resolution import measure_resolution
from sky_embeddings_tpu.data_processing.split import split_dataset
from sky_embeddings_tpu.data.synthetic import write_synthetic_h5


@pytest.fixture
def survey(tmp_path):
    """Two FITS patches + a catalog with sources inside them."""
    scale = 2.0 / 3600.0  # large pixels so a 200px tile covers ~0.1 deg
    rng = np.random.default_rng(0)
    centers = [(150.0, 2.0), (150.2, 2.0)]
    sources = []
    for pi, (ra0, dec0) in enumerate(centers):
        wcs = TanWCS(crpix=(100.5, 100.5), crval=(ra0, dec0),
                     cd=[[-scale, 0], [0, scale]])
        for band in ("G", "I"):
            data = rng.normal(size=(200, 200)).astype(np.float32)
            write_image(str(tmp_path / f"calexp-HSC-{band}-9813-{pi},0.fits"),
                        data, wcs.to_cards())
        # 5 sources well inside this patch
        for s in range(5):
            x, y = 60 + 15 * s, 70 + 10 * s
            ra, dec = wcs.pixel_to_world(x, y)
            sources.append((float(ra), float(dec)))
    cat = str(tmp_path / "catalog.csv")
    with open(cat, "w") as f:
        f.write("ra,dec,zspec,zspec_err,class\n")
        for i, (ra, dec) in enumerate(sources):
            f.write(f"{ra},{dec},{0.1 + 0.05 * i},{0.01},{i % 3}\n")
    return str(tmp_path), cat


def test_create_h5_dataset(survey, tmp_path):
    root, cat = survey
    out = str(tmp_path / "dataset.h5")
    catalog = catalog_from_csv(cat)
    assert len(catalog["ra"]) == 10
    create_h5_dataset([root], catalog, out, bands=("G", "R", "I"), min_bands=2,
                      img_size=32, verbose=False)
    with h5py.File(out, "r") as f:
        n = f["cutouts"].shape[0]
        assert n == 10  # all sources found in their patches
        assert f["cutouts"].shape[1:] == (3, 32, 32)
        assert np.isnan(f["cutouts"][:, 1]).all()  # R band missing
        assert np.isfinite(f["cutouts"][:, 0]).all()
        assert set(f.keys()) >= {"cutouts", "ra", "dec", "zspec", "zspec_err", "class"}


def test_combine_and_split(tmp_path):
    a = write_synthetic_h5(str(tmp_path / "a.h5"), 30, channels=2, img_size=8, seed=0)
    b = write_synthetic_h5(str(tmp_path / "b.h5"), 20, channels=2, img_size=8, seed=1)
    out = combine_h5_files([a, b], str(tmp_path / "ab.h5"))
    with h5py.File(out, "r") as f:
        assert f["cutouts"].shape[0] == 50
    paths = split_dataset(out)
    sizes = []
    for p in paths:
        with h5py.File(p, "r") as f:
            sizes.append(f["cutouts"].shape[0])
    assert sizes == [40, 5, 5]


def test_dedup(tmp_path):
    ra = np.asarray([10.0, 10.0 + 0.1 / 3600, 50.0, 120.0])
    dec = np.asarray([0.0, 0.0, 10.0, -5.0])
    keep = duplicate_mask(ra, dec, radius_arcsec=1.0)
    np.testing.assert_array_equal(keep, [True, False, True, True])

    src = write_synthetic_h5(str(tmp_path / "d.h5"), 20, channels=2, img_size=8)
    # overwrite ra/dec with one duplicate pair
    with h5py.File(src, "a") as f:
        ra = f["ra"][:]
        ra[1] = ra[0] + 0.1 / 3600
        dec = f["dec"][:]
        dec[1] = dec[0]
        f["ra"][:] = ra
        f["dec"][:] = dec
    n = deduplicate_h5(src, str(tmp_path / "d2.h5"), radius_arcsec=1.0)
    assert n == 19


def test_probe_sets(tmp_path):
    src = write_synthetic_h5(str(tmp_path / "p.h5"), 90, channels=2, img_size=8)
    n = make_probe_set(src, str(tmp_path / "cls.h5"), per_class=10)
    assert n == 30
    with h5py.File(str(tmp_path / "cls.h5"), "r") as f:
        _, counts = np.unique(f["class"][:], return_counts=True)
        assert (counts == 10).all()
    n = make_regression_probe_set(src, str(tmp_path / "reg.h5"), n_samples=25)
    assert n == 25


def test_resolution(survey):
    root, _ = survey
    stats = measure_resolution([root])
    assert stats["n"] > 0
    np.testing.assert_allclose(stats["mean_arcsec"], 2.0, rtol=1e-3)


# ----------------------------------------------------------------------
# Cluster queue
# ----------------------------------------------------------------------

def test_jobqueue_slurm_dry_run(tmp_path):
    q = JobQueue(str(tmp_path / "scripts"), backend="slurm")
    spec = JobSpec(name="mim_x", command="python pretrain_mim.py mim_x",
                   num_runs=3, accelerator="v5e-8")
    cmds = q.submit(spec, dry_run=True)
    assert len(cmds) == 3
    assert "--dependency" not in cmds[0]
    assert "--dependency=afterany:" in cmds[1]
    assert os.path.exists(str(tmp_path / "scripts/todo/mim_x.sh"))


def test_jobqueue_local_dry_run(tmp_path):
    q = JobQueue(str(tmp_path / "scripts"), backend="local")
    spec = JobSpec(name="mim_y", command="echo hi", num_runs=2)
    cmds = q.submit(spec, dry_run=True)
    assert cmds[0].count("bash") == 2  # chained twice


def test_jobqueue_local_executes(tmp_path):
    q = JobQueue(str(tmp_path / "scripts"), backend="local")
    marker = str(tmp_path / "ran.txt")
    spec = JobSpec(name="t", command=f"echo run >> {marker}", num_runs=2)
    q.submit(spec)
    import time

    for _ in range(50):
        if os.path.exists(marker) and open(marker).read().count("run") == 2:
            break
        time.sleep(0.1)
    assert open(marker).read().count("run") == 2
    assert os.path.exists(str(tmp_path / "scripts/done/t.sh"))


def test_cross_match_class_catalogs(tmp_path):
    """Synthetic two-catalog cross-match: class CSVs contain exactly the
    planted matches (reference 1_create_csv_files.ipynb semantics)."""
    from sky_embeddings_tpu.data_processing.cross_match import (
        cross_match_mask,
        isolated_mask,
        make_class_catalogs,
    )

    rng = np.random.default_rng(0)
    n = 200
    ra = rng.uniform(150.0, 151.0, n)
    dec = rng.uniform(1.0, 2.0, n)
    zspec = rng.uniform(0.1, 1.5, n)
    hsc = {"ra": ra, "dec": dec, "zspec": zspec, "zspec_err": 0.01 * zspec}

    # class catalog: stars = hsc[0:50] jittered < 0.5", galaxies = hsc[50:120],
    # qso = far away (no matches)
    jitter = 0.3 / 3600.0
    cls_ra = np.concatenate([ra[:50] + jitter, ra[50:120], ra[:10] + 10.0])
    cls_dec = np.concatenate([dec[:50], dec[50:120] + jitter, dec[:10]])
    cspec = np.concatenate([np.full(50, 1), np.full(70, 2), np.full(10, 3)])
    classes = {"ra": cls_ra, "dec": cls_dec, "cspec": cspec}

    paths = make_class_catalogs(
        hsc, classes, str(tmp_path), class_names=["star", "galaxy", "qso"],
        tolerance_arcsec=1.0, dedup=False,
    )
    star = np.genfromtxt(paths["star"], delimiter=",", names=True)
    gal = np.genfromtxt(paths["galaxy"], delimiter=",", names=True)
    assert star.size == 50 and gal.size == 70
    np.testing.assert_allclose(np.sort(star["zspec"]), np.sort(zspec[:50]), rtol=1e-6)
    # qso catalog was 10 degrees away -> empty
    with open(paths["qso"]) as f:
        assert len(f.readlines()) == 1  # header only

    # direct mask check: tolerance respected both ways
    m = cross_match_mask(ra, dec, cls_ra[:50], cls_dec[:50], radius_arcsec=1.0)
    assert m[:50].all() and not m[50:].any()
    m_tight = cross_match_mask(ra, dec, cls_ra[:50], cls_dec[:50], radius_arcsec=0.1)
    assert not m_tight.any()  # 0.3" jitter > 0.1" tolerance

    # isolated_mask: a planted close pair removes BOTH members
    ra2 = np.array([10.0, 10.0 + 0.2 / 3600.0, 11.0])
    dec2 = np.array([0.0, 0.0, 0.0])
    iso = isolated_mask(ra2, dec2, radius_arcsec=1.0)
    np.testing.assert_array_equal(iso, [False, False, True])


def test_h5_to_csv(tmp_path):
    from sky_embeddings_tpu.data.synthetic import write_synthetic_h5
    from sky_embeddings_tpu.data_processing.cross_match import h5_to_csv

    p = str(tmp_path / "s.h5")
    write_synthetic_h5(p, 20, channels=2, img_size=8)
    out = str(tmp_path / "s.csv")
    n = h5_to_csv(p, out)
    assert n == 20
    arr = np.genfromtxt(out, delimiter=",", names=True)
    assert set(arr.dtype.names) == {"ra", "dec", "zspec"}
