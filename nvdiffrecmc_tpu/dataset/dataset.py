"""Dataset base: indexable sample source + batch collation (parity with
/root/reference/dataset/dataset.py).  No torch DataLoader — a light python
iterator with host-side numpy collation feeds the jitted train step."""

import numpy as np


class Dataset:
    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, i):
        raise NotImplementedError

    def collate(self, batch):
        iter_res, iter_spp = batch[0]['resolution'], batch[0]['spp']
        out = {
            'mv': np.concatenate([b['mv'] for b in batch], axis=0),
            'mvp': np.concatenate([b['mvp'] for b in batch], axis=0),
            'campos': np.concatenate([b['campos'] for b in batch], axis=0),
            'resolution': iter_res,
            'spp': iter_spp,
        }
        if 'img' in batch[0]:
            out['img'] = np.concatenate([b['img'] for b in batch], axis=0)
        if 'light' in batch[0]:
            out['light'] = batch[0]['light']
        return out


def batch_iterator(dataset, batch_size, shuffle=True, seed=0):
    """Cycles over the dataset in shuffled batches forever."""
    rng = np.random.RandomState(seed)
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        rng.shuffle(order)  # first epoch must be shuffled too
    i = 0
    while True:
        if i + batch_size > n:
            if shuffle:
                rng.shuffle(order)
            i = 0
        idx = order[i:i + batch_size]
        i += batch_size
        yield dataset.collate([dataset[int(j)] for j in idx])
