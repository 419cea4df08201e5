"""L1 data acquisition: dataset scrapers + image normalization.

Module-form rebuild of the reference's img_download notebooks
(/root/reference/img_download/01_download_ukiyo-e.ipynb,
01_download_photo.ipynb — SURVEY.md §2.4): paginated WikiArt / Unsplash
API indexing, per-image download with a resumable pickled URL index, then
the "HD conversion" pass (skip-too-small, rotate portrait->landscape,
LANCZOS scale-to-cover, center-crop to exactly 1920x1080) and the
"Lowres conversion" to 480x270.

Network access is gated (this environment has zero egress); the
normalization passes are pure-PIL and fully tested offline.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Tuple

import pandas as pd
from PIL import Image

HD_SIZE = (1920, 1080)
LOWRES_SIZE = (480, 270)


# ----------------------------------------------------------- normalization
def normalize_to_cover(img: Image.Image, target: Tuple[int, int] = HD_SIZE,
                       rotate_portrait: bool = True,
                       min_size: Optional[Tuple[int, int]] = None) -> Optional[Image.Image]:
    """The notebooks' HD conversion (01_download_ukiyo-e.ipynb cell 8):
    optionally rotate portrait to landscape, LANCZOS scale-to-cover the
    target box, center-crop to exactly ``target``. Returns None when the
    source is smaller than ``min_size`` (skip-too-small)."""
    img = img.convert("RGB")
    if rotate_portrait and img.height > img.width:
        img = img.transpose(Image.ROTATE_90)
    min_w, min_h = min_size if min_size is not None else target
    if img.width < min_w or img.height < min_h:
        return None
    scale = max(target[0] / img.width, target[1] / img.height)
    new_size = (max(round(img.width * scale), target[0]),
                max(round(img.height * scale), target[1]))
    img = img.resize(new_size, Image.LANCZOS)
    left = (img.width - target[0]) // 2
    top = (img.height - target[1]) // 2
    return img.crop((left, top, left + target[0], top + target[1]))


def make_lowres(img: Image.Image, target: Tuple[int, int] = LOWRES_SIZE) -> Image.Image:
    """Lowres conversion (01_download_photo.ipynb cell 13)."""
    return img.convert("RGB").resize(target, Image.LANCZOS)


def normalize_directory(src_dir: str, dst_dir: str, ext: str = ".jpg",
                        target: Tuple[int, int] = HD_SIZE, quality: int = 100,
                        rotate_portrait: bool = True, prog_func=None) -> int:
    """Run the HD conversion over a raw directory; returns #converted."""
    os.makedirs(dst_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(src_dir) if f.endswith(ext))
    it = prog_func(files) if prog_func else files
    count = 0
    for f in it:
        img = Image.open(os.path.join(src_dir, f))
        out = normalize_to_cover(img, target, rotate_portrait)
        if out is None:
            continue
        out.save(os.path.join(dst_dir, f), quality=quality)
        count += 1
    return count


def lowres_directory(src_dir: str, dst_dir: str, ext: str = ".jpg",
                     target: Tuple[int, int] = LOWRES_SIZE,
                     quality: int = 100, prog_func=None) -> int:
    os.makedirs(dst_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(src_dir) if f.endswith(ext))
    it = prog_func(files) if prog_func else files
    for f in it:
        img = Image.open(os.path.join(src_dir, f))
        make_lowres(img, target).save(os.path.join(dst_dir, f), quality=quality)
    return len(files)


# ---------------------------------------------------------------- indexing
def _require_requests():
    try:
        import requests  # noqa: F401

        return requests
    except Exception as e:  # pragma: no cover
        raise RuntimeError(
            "data acquisition needs network access + the requests package; "
            "this environment is offline — use pre-extracted image dirs"
        ) from e


def index_wikiart(style: str = "ukiyo-e", max_pages: int = 100,
                  session=None) -> pd.DataFrame:
    """Paginated WikiArt JSON API scrape -> DataFrame(url, title, ...)
    (01_download_ukiyo-e.ipynb cells 1-3). Network-gated."""
    requests = _require_requests()
    sess = session or requests.Session()
    rows = []
    for page in range(1, max_pages + 1):
        url = ("https://www.wikiart.org/en/paintings-by-style/"
               f"{style}?select=featured&json=2&page={page}")
        data = sess.get(url, timeout=30).json()
        paintings = data.get("Paintings") or []
        if not paintings:
            break
        for p in paintings:
            rows.append({"url": p.get("image"), "title": p.get("title"),
                         "width": p.get("width"), "height": p.get("height")})
    return pd.DataFrame(rows)


def index_unsplash(query: str = "landscape", per_page: int = 30,
                   max_pages: int = 100, access_key: Optional[str] = None,
                   session=None) -> pd.DataFrame:
    """Unsplash search API index (01_download_photo.ipynb cells 1-5).
    Network-gated; key via arg or UNSPLASH_ACCESS_KEY."""
    requests = _require_requests()
    key = access_key or os.environ.get("UNSPLASH_ACCESS_KEY")
    if not key:
        raise RuntimeError("Unsplash access key required")
    sess = session or requests.Session()
    rows = []
    for page in range(1, max_pages + 1):
        r = sess.get(
            "https://api.unsplash.com/search/photos",
            params={"query": query, "page": page, "per_page": per_page},
            headers={"Authorization": f"Client-ID {key}"}, timeout=30).json()
        results = r.get("results") or []
        if not results:
            break
        for p in results:
            rows.append({"url": p["urls"]["raw"], "width": p["width"],
                         "height": p["height"], "id": p["id"]})
    return pd.DataFrame(rows)


def download_index(index: pd.DataFrame, dst_dir: str, url_col: str = "url",
                   index_pickle: Optional[str] = None, session=None,
                   prog_func=None) -> int:
    """Download every indexed image, skipping files that already exist (the
    pickle-based resume support of 01_download_photo.ipynb cells 5-8)."""
    requests = _require_requests()
    sess = session or requests.Session()
    os.makedirs(dst_dir, exist_ok=True)
    if index_pickle:
        index.to_pickle(index_pickle)
    it = prog_func(index.iterrows()) if prog_func else index.iterrows()
    count = 0
    for i, row in it:
        path = os.path.join(dst_dir, f"im_{i:06d}.jpg")
        if os.path.exists(path):
            continue
        resp = sess.get(row[url_col], timeout=60)
        resp.raise_for_status()
        with open(path, "wb") as fh:
            fh.write(resp.content)
        count += 1
    return count
