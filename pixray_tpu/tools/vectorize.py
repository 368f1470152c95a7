"""Vector-prompt builder: embed image sets, derive CLIP attribute directions.

Parity with /root/reference/vectorize.py: ``--inputs`` embeds a glob of images
with every requested perceptor into a per-model JSON table; ``--avg-diff a,b``
writes mean(b)−mean(a) direction vectors; ``--svm-diff a,b`` fits a linear SVM
and writes its hyperplane normal scaled to the mean-diff length.  Output JSON is
consumed by the engine's vector prompts (engine/prompts.py, pixray.py:887-915).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from pixray_tpu.io.images import load_image_for_perceptor
from pixray_tpu.models.clip.configs import CLIP_CONFIGS, SLIP_CONFIGS
from pixray_tpu.models.perceptor import get_clip_perceptor
from pixray_tpu.utils import real_glob

_perceptors: dict = {}


def init(args):
    if args.models is not None:
        args.models = [m.strip() for m in args.models.split(",")]
    else:
        args.models = [m for m in CLIP_CONFIGS if m != "TinyTest"] + sorted(SLIP_CONFIGS)
    for name in args.models:
        _perceptors[name] = get_clip_perceptor(name)


def spew_vectors(args, inputs, outfile):
    input_files = real_glob(inputs)
    if getattr(args, "limit", None):
        input_files = input_files[: args.limit]
    save_table = {}
    for name in args.models:
        perceptor = _perceptors[name]
        print(f"Running {name} at {perceptor.input_resolution}")
        images = np.stack(
            [load_image_for_perceptor(f, perceptor.input_resolution) for f in input_files]
        )
        features = np.asarray(perceptor.encode_image(images, apply_preprocess=True))
        print(f"saving {features.shape} to {name}")
        save_table[name] = features.tolist()
    with open(outfile, "w") as fp:
        json.dump(save_table, fp)


def run_avg_diff(args):
    f1, f2 = args.avg_diff.split(",")
    with open(f1) as f_in:
        table1 = json.load(f_in)
    with open(f2) as f_in:
        table2 = json.load(f_in)
    save_table = {}
    for k in table1:
        e1, e2 = np.array(table1[k]), np.array(table2[k])
        print(f"Taking the difference between {e1.shape} and {e2.shape} vectors")
        atvec = np.mean(e2, axis=0) - np.mean(e1, axis=0)
        save_table[k] = atvec.reshape(1, -1).tolist()
    with open(args.outfile, "w") as fp:
        json.dump(save_table, fp)


def run_svm_diff(args):
    from sklearn import svm

    f1, f2 = args.svm_diff.split(",")
    with open(f1) as f_in:
        table1 = json.load(f_in)
    with open(f2) as f_in:
        table2 = json.load(f_in)
    save_table = {}
    for k in table1:
        e1, e2 = np.array(table1[k]), np.array(table2[k])
        print(f"Taking the svm difference between {e1.shape} and {e2.shape} vectors")
        X = np.concatenate([e1, e2], axis=0)
        y = np.concatenate([np.zeros(len(e1)), np.ones(len(e2))])
        svc = svm.LinearSVC(C=1.0, max_iter=20000).fit(X, y)
        w = svc.coef_[0]
        # scale the hyperplane normal to the mean-diff length (vectorize.py:128-136)
        mean_length = np.linalg.norm(np.mean(e1, axis=0) - np.mean(e2, axis=0))
        atvec = (mean_length / np.linalg.norm(w)) * w
        save_table[k] = atvec.reshape(1, -1).tolist()
    with open(args.outfile, "w") as fp:
        json.dump(save_table, fp)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Build CLIP vector prompts")
    parser.add_argument("--models", type=str, help="perceptor list", default=None, dest="models")
    parser.add_argument("--inputs", type=str, help="Images to process", default=None, dest="inputs")
    parser.add_argument("--avg-diff", dest="avg_diff", type=str, default=None, help="Two vector files to average and then diff")
    parser.add_argument("--svm-diff", dest="svm_diff", type=str, default=None, help="Two vector files for an SVM hyperplane diff")
    parser.add_argument("--outfile", type=str, help="Output JSON", default="vectors.json", dest="outfile")
    parser.add_argument("--limit", dest="limit", type=int, default=None, help="Limit number of inputs when computing atvecs")
    # reference flag-surface parity (/root/reference/vectorize.py:144-177):
    # these are parsed-but-unused in the reference's main() too — accepted so
    # scripts written against the reference tool run unchanged
    parser.add_argument("--z-dim", dest="z_dim", type=int, default=100, help=argparse.SUPPRESS)
    parser.add_argument("--encoded-vectors", type=str, default=None, help=argparse.SUPPRESS)
    parser.add_argument("--encoded-true", type=str, default=None, help=argparse.SUPPRESS)
    parser.add_argument("--encoded-false", type=str, default=None, help=argparse.SUPPRESS)
    parser.add_argument("--thresh", dest="thresh", default=False, action="store_true", help=argparse.SUPPRESS)
    parser.add_argument("--svm", dest="svm", default=False, action="store_true", help=argparse.SUPPRESS)
    parser.add_argument("--attribute-vectors", dest="attribute_vectors", default=None, help=argparse.SUPPRESS)
    parser.add_argument("--attribute-thresholds", dest="attribute_thresholds", default=None, help=argparse.SUPPRESS)
    parser.add_argument("--attribute-set", dest="attribute_set", default="all", help=argparse.SUPPRESS)
    parser.add_argument("--attribute-indices", dest="attribute_indices", default=None, type=str, help=argparse.SUPPRESS)
    args = parser.parse_args(argv)

    if args.avg_diff:
        run_avg_diff(args)
    elif args.svm_diff:
        run_svm_diff(args)
    elif args.inputs:
        init(args)
        spew_vectors(args, args.inputs, args.outfile)
    else:
        parser.print_help()


if __name__ == "__main__":
    main()
