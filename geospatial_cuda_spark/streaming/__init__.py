# Submodules are imported explicitly by consumers.
