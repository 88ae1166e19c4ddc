"""Dataset downloader (utils/get_data.py:11-110 + datasets/download_*.sh).

Downloads the standard pix2pix/cyclegan dataset tarballs. In air-gapped
environments this fails fast with the URL so the user can fetch manually.
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
import zipfile

PIX2PIX_URL = "http://efrosgans.eecs.berkeley.edu/pix2pix/datasets/"
CYCLEGAN_URL = "https://people.eecs.berkeley.edu/~taesung_park/CycleGAN/datasets/"

PIX2PIX_DATASETS = ["cityscapes", "edges2handbags", "edges2shoes",
                    "facades", "maps", "night2day"]
CYCLEGAN_DATASETS = ["apple2orange", "summer2winter_yosemite", "horse2zebra",
                     "monet2photo", "cezanne2photo", "ukiyoe2photo",
                     "vangogh2photo", "maps", "cityscapes", "facades",
                     "iphone2dslr_flower"]


class GetData:
    def __init__(self, technique: str = "cyclegan", save_path: str = "./database"):
        self.technique = technique.lower()
        self.save_path = save_path

    def available(self):
        return PIX2PIX_DATASETS if self.technique == "pix2pix" \
            else CYCLEGAN_DATASETS

    def get(self, dataset: str) -> str:
        if dataset not in self.available():
            raise ValueError(f"unknown dataset [{dataset}]; "
                             f"available: {self.available()}")
        base = PIX2PIX_URL if self.technique == "pix2pix" else CYCLEGAN_URL
        ext = ".tar.gz" if self.technique == "pix2pix" else ".zip"
        url = f"{base}{dataset}{ext}"
        os.makedirs(self.save_path, exist_ok=True)
        archive = os.path.join(self.save_path, dataset + ext)
        target = os.path.join(self.save_path, dataset)
        if os.path.isdir(target):
            return target
        try:
            print(f"downloading {url}")
            urllib.request.urlretrieve(url, archive)
        except OSError as e:
            raise RuntimeError(
                f"download failed ({e}); fetch {url} manually and unpack "
                f"into {target}") from e
        if ext == ".zip":
            with zipfile.ZipFile(archive) as z:
                z.extractall(self.save_path)
        else:
            with tarfile.open(archive) as t:
                t.extractall(self.save_path)
        os.remove(archive)
        return target
