"""``python -m image_captioning_through_rl_tpu`` runs the CLI pipeline
(the same driver as the repo-root ``image_captioner.py`` shim)."""

from .cli.main import run

if __name__ == "__main__":
    run()
