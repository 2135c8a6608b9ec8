#!/usr/bin/env python
"""CLI: train a sulci-labelling model from a parameters.json.

Drop-in equivalent of the reference's driver (ref main.py:24-31):

    python main.py -p parameters.json

accepts the reference's parameters.json schema verbatim (plus an optional
"tpu" sub-dict, see unetsulc_tpu.config.TpuConfig) and writes the same
artifact tree under working_path/{data,results,models,tensorboard}.
"""

import argparse
import os
import warnings

# the reference filters this labeling-time warning (ref main.py:21)
warnings.filterwarnings(
    action="ignore", message="the number of", category=UserWarning
)


def main():
    parser = argparse.ArgumentParser(description="Train UNET model")
    parser.add_argument(
        "-p",
        dest="parameters",
        type=str,
        default=None,
        required=False,
        help="Parameter file",
    )
    args = parser.parse_args()
    path = args.parameters or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "parameters.json"
    )

    from unetsulc_tpu.config import Parameters
    from unetsulc_tpu.experiment.driver import run_experiment
    from unetsulc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    params = Parameters.from_file(path)
    run_experiment(params)


if __name__ == "__main__":
    main()
