'''
GSO asset taxonomy: which assets can act as containers / carriers / hats / shoes / boxes.

The reference ships hand-curated ID lists (/root/reference/gen_kubric/kubric_constants.py).
This rebuild classifies assets by keyword instead, so the taxonomy works against any GSO
manifest snapshot, and accepts user-provided override lists via JSON for exact control.
'''

import json
import os
from typing import Dict, List, Optional, Sequence

# Name fragments (lowercased substring match on the asset ID) per role. Containers must be
# open-top receptacles; carriers are flat supporting surfaces; boxes are cuboid dynamics.
CONTAINER_KEYWORDS = (
    'bowl', 'cup', 'mug', 'pot', 'bin', 'basket', 'bucket', 'tray', 'dish', 'saucer',
    'utensil_holder', 'organizer', 'container', 'crock', 'ramekin', 'planter', 'colander',
    'pan', 'casserole', 'tub', 'caddy', 'pitcher',
)
CARRIER_KEYWORDS = (
    'plate', 'tray', 'board', 'lid', 'skillet', 'platter', 'dish_rack', 'pan', 'sheet',
    'coaster', 'tin',
)
HAT_KEYWORDS = ('hat', 'cap', 'helmet', 'sombrero', 'fedora', 'beanie')
# The reference matches shoes/boxes by substring too (kubric_sim.py:96-97,
# kubric_constants.py:130-225); these mirror that intent.
SHOE_KEYWORDS = ('shoe', 'sneaker', 'boot', 'sandal', 'loafer', 'slipper', 'moccasin',
                 'cleat', 'heel', 'oxford')
BOX_KEYWORDS = ('box', 'carton', 'crate', 'cube', 'brick', 'pack')


def _match(asset_ids: Sequence[str], keywords: Sequence[str]) -> List[str]:
    return [a for a in asset_ids if any(k in a.lower() for k in keywords)]


class AssetTaxonomy:

    def __init__(self, all_asset_ids: Sequence[str],
                 override_json: Optional[str] = None):
        self.all_ids = list(all_asset_ids)
        self.roles: Dict[str, List[str]] = {
            'container': _match(self.all_ids, CONTAINER_KEYWORDS),
            'carrier': _match(self.all_ids, CARRIER_KEYWORDS),
            'hat': _match(self.all_ids, HAT_KEYWORDS),
            'shoe': _match(self.all_ids, SHOE_KEYWORDS),
            'box': _match(self.all_ids, BOX_KEYWORDS),
        }
        if override_json and os.path.exists(override_json):
            with open(override_json, 'r') as f:
                overrides = json.load(f)
            for role, ids in overrides.items():
                self.roles[role] = [a for a in ids if a in set(self.all_ids)] or ids

    def ids_for(self, role: str) -> List[str]:
        ids = self.roles.get(role, [])
        if not ids:
            raise ValueError(f'no assets classified for role {role}')
        return ids
