from . import geometry, boxes
