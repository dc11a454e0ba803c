"""Error taxonomy.

The reference threads an int-code `base::Status` through every API
(kuiper/include/base/base.h:77-150 with factories error::Success /
InvalidArgument / PathNotValid / ModelParseError / InternalError /
KeyValueHasExist + the STATUS_CHECK fatal macro). The Python idiom is an
exception hierarchy with the same taxonomy; loaders and the serving API
raise these instead of returning codes.
"""

from __future__ import annotations


class KuiperError(Exception):
    """Base class (reference base::Status non-success)."""

    code = 1  # kInternalError


class InvalidArgument(KuiperError):
    code = 2  # error::InvalidArgument


class PathNotValid(KuiperError):
    code = 3  # error::PathNotValid


class ModelParseError(KuiperError):
    code = 4  # error::ModelParseError


class InternalError(KuiperError):
    code = 5  # error::InternalError


class KeyHasExits(KuiperError):
    code = 6  # error::KeyHasExits (sic, reference spelling)


def check(cond: bool, msg: str, exc=InvalidArgument):
    """STATUS_CHECK analogue (base.h:123-134) — raises instead of aborting."""
    if not cond:
        raise exc(msg)
