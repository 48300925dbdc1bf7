'use strict';
// Load-time stub only: geonames.js requires request at module scope but
// only calls it from the download step, which REFPARITY never exercises
// (the transform step reads pre-staged files).
module.exports = {
  get() { throw new Error('request stub: download step is out of REFPARITY scope'); },
};
