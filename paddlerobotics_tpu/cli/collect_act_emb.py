"""Build the multimodal action embedding table (mirror of HRI
scripts/collect_act_emb.py:42-54): catalog tsv → concat(one-hot act,
one-hot exp, text-encoder(utterance)) rows → raw_wae.npy."""

from __future__ import annotations

import argparse

import numpy as np

# host-side artifact job: avoid remote-TPU compile latency
import jax
jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--catalog", type=str, required=True,
                   help="tsv: act \\t exp \\t utterance \\t movement")
    p.add_argument("--out", type=str, default="raw_wae.npy")
    p.add_argument("--version", type=str, default="v1")
    p.add_argument("--encoder", type=str, default="random",
                   choices=["random", "bow", "ernie"],
                   help="utterance encoder (pretrained weights are not "
                        "bundled; random/bow for bootstrap)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from paddlerobotics_tpu.hri import actions as am

    catalog = []
    with open(args.catalog) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if not parts or not parts[0]:
                continue
            catalog.append(am.MultimodalAction(*(parts + ["null"] * 4)[:4]))

    if args.encoder == "random":
        rng = np.random.RandomState(args.seed)
        utt = rng.randn(len(catalog), 768).astype(np.float32) * 0.02
    else:
        texts = [a.utterance for a in catalog]
        if args.encoder == "bow":
            import jax.numpy as jnp

            from paddlerobotics_tpu.hri.perception.utterance import \
                BoWEncoder, WordPieceTokenizer

            vocab = {"[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
            for t in texts:
                for ch in t:
                    vocab.setdefault(ch, len(vocab) + 1)
            tok = WordPieceTokenizer(vocab)
            ids = jnp.asarray(np.stack([tok.encode(t, 32) for t in texts]))
            enc = BoWEncoder(vocab_size=len(vocab) + 2)
            params = enc.init(jax.random.key(args.seed), ids)
            utt = np.asarray(enc.apply(params, ids))
        else:
            from paddlerobotics_tpu.hri.perception.utterance import \
                UtteranceEncoder

            ue = UtteranceEncoder()
            ue.init(jax.random.key(args.seed))
            utt = np.asarray(ue.encode(texts))

    table = am.build_action_embeddings(catalog, utt, version=args.version)
    np.save(args.out, table)
    print(f"{table.shape} → {args.out}")


if __name__ == "__main__":
    main()
