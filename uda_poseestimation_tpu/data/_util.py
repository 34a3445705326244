"""Download/check helpers — twin of lib/datasets/_util.py (torchvision-free).

This host has no network egress; ``download`` therefore extracts only from an
already-present archive or falls through to a clear error, keeping the same
call-sites and directory contract as the reference.
"""

from __future__ import annotations

import os
import shutil
import sys
import urllib.request
from typing import List


def _extract(archive_path: str, root: str):
    shutil.unpack_archive(archive_path, root)


def download(root: str, file_name: str, archive_name: str, url_link: str):
    """Ensure ``root/file_name`` exists, downloading/extracting if needed."""
    if not os.path.exists(os.path.join(root, file_name)):
        print("Downloading {}".format(file_name))
        archive_path = os.path.join(root, archive_name)
        try:
            if not os.path.exists(archive_path):
                os.makedirs(root, exist_ok=True)
                urllib.request.urlretrieve(url_link, archive_path)
            _extract(archive_path, root)
        except Exception:
            print("Fail to download {} from url link {}".format(archive_name, url_link))
            print("Please check you internet connection."
                  "Simply trying again may be fine.")
            sys.exit(0)


def check_exits(root: str, file_name: str):
    """Check whether ``file_name`` exists under directory ``root``."""
    if not os.path.exists(os.path.join(root, file_name)):
        print("Dataset directory {} not found under {}".format(file_name, root))
        sys.exit(-1)


def read_list_from_file(file_name: str) -> List[str]:
    with open(file_name, "r") as f:
        return [line.strip() for line in f.readlines()]
