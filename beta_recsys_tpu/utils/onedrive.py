"""OneDrive share-link downloader for team-published processed splits.

Reference parity: beta_rec/utils/onedrive.py:13-115 (aiohttp/aiofiles async
downloader). This version is synchronous requests-based: a share URL is
converted to a direct-download API URL via the base64 share-id scheme.
Network access may be unavailable; callers should treat failures as cache
misses and rebuild splits locally.
"""

import base64
import os

from .common import ensure_dir


def share_link_to_download_url(share_link):
    """Convert a 1drv.ms share link into a direct-download API URL."""
    b64 = base64.urlsafe_b64encode(share_link.encode()).decode().rstrip("=")
    return f"https://api.onedrive.com/v1.0/shares/u!{b64}/root/content"


class OneDrive:
    """Download a shared OneDrive file/folder archive to a local path."""

    def __init__(self, url=None, path=None):
        self.url = url
        self.path = path

    def download(self):
        if not self.url:
            raise ValueError("OneDrive url not set")
        import requests

        ensure_dir(self.path)
        target = os.path.join(self.path, "onedrive_download.zip")
        r = requests.get(share_link_to_download_url(self.url), stream=True, timeout=120)
        r.raise_for_status()
        with open(target, "wb") as f:
            for chunk in r.iter_content(chunk_size=1 << 20):
                f.write(chunk)
        from .common import un_zip

        try:
            un_zip(target, self.path)
        except Exception:
            pass  # single file, not an archive
        return target
