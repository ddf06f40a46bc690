"""Import smoke test — every module in the package imports cleanly
(the reference's .github/workflows/import-test.yml `check_imports` analogue,
SURVEY.md §4)."""

import importlib
import pkgutil

import conformer_nemo_tpu


def test_all_modules_import():
    failures = []
    for info in pkgutil.walk_packages(conformer_nemo_tpu.__path__,
                                      prefix="conformer_nemo_tpu."):
        try:
            importlib.import_module(info.name)
        except Exception as e:  # noqa: BLE001 - report all failures at once
            failures.append((info.name, repr(e)))
    assert not failures, failures
