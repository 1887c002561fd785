"""mmf_interactive: REPL over the Inference pipeline
(parity with mmf_cli/interactive.py:19-60)."""

from __future__ import annotations

import argparse

from mmf_tpu.utils.env import setup_imports
from mmf_tpu.utils.inference import Inference


def interactive(checkpoint_path=None):
    setup_imports()
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", type=str, default=checkpoint_path)
    args, _ = parser.parse_known_args()
    inference = Inference(checkpoint_path=args.checkpoint_path)

    print("Enter 'exit' at any point to terminate.")
    print("Enter an image path:")
    image_path = input()
    while image_path != "exit":
        print("Got image path", image_path)
        print("Enter text (question):")
        text = input()
        while text != "exit":
            answer = inference.forward(
                image_path, {"text": text}, image_format="path"
            )
            print("Answer:", answer)
            print("Enter another text or 'exit' for a new image:")
            text = input()
        print("Enter an image path:")
        image_path = input()


if __name__ == "__main__":
    interactive()
