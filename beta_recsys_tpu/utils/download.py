"""Dataset download helpers (plain host-side I/O).

Reference semantics: beta_rec/utils/download.py:9-63 (streaming HTTP with a
progress bar and an archive-format map). Network access may be unavailable in
some environments; callers should catch exceptions and fall back to local files.
"""

import os
import shutil

from .common import ensure_dir

# Map of archive suffix -> unpack format understood by shutil.
ARCHIVE_FORMATS = {
    ".zip": "zip",
    ".tar": "tar",
    ".tar.gz": "gztar",
    ".tgz": "gztar",
    ".tar.bz2": "bztar",
    ".gz": "gzip",
    ".7z": "7z",
}


def get_format(suffix):
    """Return the unpack format name for an archive suffix (e.g. 'zip')."""
    suffix = suffix.lower()
    if not suffix.startswith("."):
        suffix = "." + suffix
    for ext, fmt in ARCHIVE_FORMATS.items():
        if suffix.endswith(ext):
            return fmt
    raise ValueError(f"Unknown archive format: {suffix}")


def download_file(url, store_file_path):
    """Stream-download ``url`` to ``store_file_path`` with a progress bar."""
    import requests
    from tqdm import tqdm

    ensure_dir(os.path.dirname(store_file_path))
    r = requests.get(url, stream=True, timeout=60)
    r.raise_for_status()
    total = int(r.headers.get("content-length", 0))
    with open(store_file_path, "wb") as f, tqdm(
        total=total, unit="iB", unit_scale=True, desc=os.path.basename(store_file_path)
    ) as bar:
        for chunk in r.iter_content(chunk_size=1 << 20):
            f.write(chunk)
            bar.update(len(chunk))
    return store_file_path


def unpack_archive(archive_path, target_dir):
    """Unpack zip/tar/gz archives; gzip single files are decompressed in place."""
    ensure_dir(target_dir)
    lower = archive_path.lower()
    if lower.endswith((".tar.gz", ".tgz", ".tar", ".tar.bz2", ".zip")):
        shutil.unpack_archive(archive_path, target_dir)
    elif lower.endswith(".gz"):
        import gzip

        out = os.path.join(target_dir, os.path.basename(archive_path)[:-3])
        with gzip.open(archive_path, "rb") as fin, open(out, "wb") as fout:
            shutil.copyfileobj(fin, fout)
    elif lower.endswith(".7z"):
        try:
            import py7zr

            with py7zr.SevenZipFile(archive_path, mode="r") as z:
                z.extractall(path=target_dir)
        except ImportError as e:
            raise RuntimeError("7z archives require py7zr, which is unavailable") from e
    else:
        raise ValueError(f"Unknown archive type: {archive_path}")
