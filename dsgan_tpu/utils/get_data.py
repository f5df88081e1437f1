"""Dataset downloader (capability parity with reference
DSGAN/util/get_data.py: scrape the Berkeley pix2pix/cyclegan dataset
listings, download and extract an archive). Uses only the stdlib
(urllib + html.parser + tarfile/zipfile) — the reference needed
requests + BeautifulSoup.

This environment is zero-egress; network failures raise a clear error.
"""

import os
import re
import tarfile
import zipfile
from html.parser import HTMLParser
from urllib.request import urlopen


class _LinkParser(HTMLParser):
    def __init__(self):
        super().__init__()
        self.hrefs = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


class GetData:
    """Download CycleGAN / Pix2Pix datasets.

    >>> gd = GetData(technique='cyclegan')
    >>> gd.get(save_path='./datasets')  # interactive selection
    """

    def __init__(self, technique="cyclegan", verbose=True, url=None):
        url_dict = {
            "pix2pix": "https://efrosgans.eecs.berkeley.edu/pix2pix/datasets/",
            "cyclegan": "https://efrosgans.eecs.berkeley.edu/cyclegan/datasets/",
        }
        # url overrides the canonical listing (mirrors / local archives);
        # must end with '/' and serve an HTML index of archive links.
        self.url = url if url is not None else url_dict[technique.lower()]
        self._verbose = verbose

    def _print(self, text):
        if self._verbose:
            print(text)

    @staticmethod
    def _get_options(hrefs):
        return [h for h in hrefs if h.endswith((".zip", ".tar.gz", ".tgz"))]

    def _list_archives(self):
        try:
            with urlopen(self.url, timeout=30) as r:
                html = r.read().decode("utf-8", "replace")
        except OSError as e:
            raise RuntimeError(
                f"cannot reach {self.url} (offline environment?): {e}"
            ) from e
        parser = _LinkParser()
        parser.feed(html)
        return self._get_options(parser.hrefs)

    def _present_options(self):
        options = self._list_archives()
        print("Options:\n")
        for i, o in enumerate(options):
            print(f"{i}: {o}")
        choice = int(input("\nPlease enter the number of the dataset above you wish to download: "))
        return options[choice]

    def _download_data(self, dataset_url, save_path):
        os.makedirs(save_path, exist_ok=True)
        base = os.path.basename(dataset_url)
        save_path_full = os.path.join(save_path, base)
        self._print(f"downloading {dataset_url} -> {save_path_full}")
        with urlopen(dataset_url, timeout=60) as r, open(save_path_full, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        if base.endswith(".tar.gz") or base.endswith(".tgz"):
            with tarfile.open(save_path_full) as obj:
                obj.extractall(save_path)
        elif base.endswith(".zip"):
            with zipfile.ZipFile(save_path_full) as obj:
                obj.extractall(save_path)
        os.remove(save_path_full)

    def get(self, save_path, dataset=None):
        """Download a dataset; interactive selection when dataset is None.
        Returns the absolute path of the extracted dataset."""
        if dataset is None:
            selected = self._present_options()
        else:
            selected = dataset
        self._download_data(self.url + selected, save_path)
        stem = re.sub(r"\.(zip|tar\.gz|tgz)$", "", selected)
        return os.path.abspath(os.path.join(save_path, stem))
