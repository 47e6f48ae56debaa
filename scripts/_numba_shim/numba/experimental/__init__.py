"""jitclass → identity decorator (see package docstring)."""


def jitclass(spec=None):
    if isinstance(spec, type):  # bare @jitclass usage
        return spec

    def deco(cls):
        return cls

    return deco
