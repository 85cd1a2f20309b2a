"""Legacy-editable shim: metadata lives in pyproject.toml ([project]);
this file only lets `pip install -e .` use setup.py develop on
environments without the `wheel` package (see pyproject.toml note)."""

from setuptools import setup

setup()
