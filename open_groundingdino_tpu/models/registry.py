"""Tiny name -> build-function registry (reference models/registry.py:12-59)."""
from __future__ import annotations

from typing import Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._funcs: Dict[str, Callable] = {}

    def registe_with_name(self, module_name: str):  # reference spelling
        def deco(fn):
            if module_name in self._funcs:
                raise KeyError(f"{module_name} already registered in {self.name}")
            self._funcs[module_name] = fn
            return fn

        return deco

    register = registe_with_name

    def get(self, name: str) -> Callable:
        return self._funcs[name]

    def __contains__(self, name: str) -> bool:
        return name in self._funcs


MODULE_BUILD_FUNCS = Registry("model build functions")


def build_model_main(args):
    """reference main.py:85-92."""
    assert args.modelname in MODULE_BUILD_FUNCS, args.modelname
    return MODULE_BUILD_FUNCS.get(args.modelname)(args)
