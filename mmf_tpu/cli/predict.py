"""mmf_predict: generate prediction reports
(parity with mmf_cli/predict.py:9-15)."""

from __future__ import annotations

import sys
import typing

from mmf_tpu.cli.run import run


def predict(opts: typing.Optional[typing.List[str]] = None):
    if opts is None:
        sys.argv.extend(["evaluation.predict=true"])
    else:
        opts.extend(["evaluation.predict=true"])
    return run(predict=True, opts=opts)


if __name__ == "__main__":
    predict()
