"""RGB color k-NN — the reference's smallest example
(instant-distance/examples/colors.rs): build a 3-point map, query burnt
orange, print the nearest color name.  Expected output: red.
"""

import numpy as np

from instant_distance_tpu import Builder, Config, Search
from instant_distance_tpu.models.hnsw import HnswMap


def main() -> None:
    points = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.float32)
    values = ["red", "green", "blue"]

    map_ = HnswMap.build(points, values, Config(metric="euclidean"))
    search = Search()

    burnt_orange = np.array([204, 85, 0], np.float32)
    closest = next(iter(map_.search(burnt_orange, search)))
    print(closest.value)


if __name__ == "__main__":
    main()
