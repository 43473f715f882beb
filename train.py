#!/usr/bin/env python
"""Config-file-driven training CLI, API-compatible with the reference.

Usage (identical to the reference, README.md:69):

    python train.py --TextArgs=config/DQSELD-TCN-S1-PHI_8ch.txt

Every ``--key=value`` flag from the reference's argparse surface
(reference train.py:718-817) is accepted, both inside the text config and
directly on the command line (command line overrides the file). Unknown keys
in config files are warned about and ignored (the shipped reference configs
contain one: ``phm_n``).
"""

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--TextArgs", type=str, default=None,
                        help="Path to a text config with --key=value lines")
    parser.add_argument("--max_epochs", type=int, default=None,
                        help="Hard epoch cap (extension; default: reference early-stopping only)")
    args, extra = parser.parse_known_args(argv)

    from seld_tpu.parallel import multihost

    # env-driven (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID);
    # single-process no-op. Must run before any backend use.
    if multihost.initialize():
        import jax

        print(f"multihost: process {jax.process_index()}/{jax.process_count()}")

    from seld_tpu.config import load_config, tokens_to_config

    cfg = load_config(args.TextArgs)
    if extra:
        cfg = tokens_to_config(extra, base=cfg)

    from seld_tpu.training import Trainer

    trainer = Trainer(cfg)
    results = trainer.run(max_epochs=args.max_epochs)
    print("RESULTS")
    for key, val in results.items():
        if "hist" not in key:
            print(key, val)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
