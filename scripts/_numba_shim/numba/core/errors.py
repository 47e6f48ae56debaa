"""Warning classes the reference imports to silence real numba."""


class NumbaDeprecationWarning(Warning):
    pass


class NumbaPendingDeprecationWarning(Warning):
    pass


class NumbaTypeSafetyWarning(Warning):
    pass
