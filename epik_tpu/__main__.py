"""``python -m epik_tpu`` entry point (the reference's ``epik.py`` surface)."""

from .cli.main import epik

if __name__ == "__main__":
    epik()
