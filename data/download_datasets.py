"""Dataset fetcher (capability of /root/reference/data/download_datasets.py):
downloads the NeRF-synthetic scenes, the NeRFactor scenes, and the NeRD
moldGoldCape capture into ./data so the nerf_*/nerfactor_*/nerd_* configs run.

Requires network access; in air-gapped environments point --data-root at an
existing copy instead."""

import argparse
import os
import sys
import zipfile

NERF_SYNTHETIC_GDRIVE = "18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG"
NERFACTOR = {
    'hotdog': 'hotdog_2163',
    'drums': 'drums_3072',
    'ficus': 'ficus_2188',
    'lego': 'lego_3072',
}
NERD_GOLD = ("https://www.dropbox.com/s/tjowst4q1kl9kiv/"
             "moldGoldCape.zip?dl=1")


def download_nerf_synthetic(out):
    try:
        import gdown
    except ImportError:
        print("gdown not installed; download nerf_synthetic.zip manually "
              "from the NeRF project page and unzip into %s" % out)
        return
    path = os.path.join(out, 'nerf_synthetic.zip')
    gdown.download(id=NERF_SYNTHETIC_GDRIVE, output=path)
    with zipfile.ZipFile(path) as z:
        z.extractall(out)


def download_nerfactor(out):
    try:
        import gdown
    except ImportError:
        print("gdown not installed; skipping nerfactor")
        return
    for scene, folder in NERFACTOR.items():
        gdown.download_folder(
            url='https://drive.google.com/drive/folders/'
                'nerfactor_%s' % folder,
            output=os.path.join(out, 'nerfactor_%s' % scene))


def download_nerd_gold(out):
    import urllib.request
    path = os.path.join(out, 'moldGoldCape.zip')
    print("downloading", NERD_GOLD)
    urllib.request.urlretrieve(NERD_GOLD, path)
    with zipfile.ZipFile(path) as z:
        z.extractall(out)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument('--datasets', nargs='*',
                    default=['nerf_synthetic', 'nerfactor', 'nerd'])
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if 'nerf_synthetic' in args.datasets:
        download_nerf_synthetic(args.out)
    if 'nerfactor' in args.datasets:
        download_nerfactor(args.out)
    if 'nerd' in args.datasets:
        download_nerd_gold(args.out)
