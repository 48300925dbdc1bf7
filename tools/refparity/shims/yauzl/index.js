'use strict';
// Load-time stub only: yauzl is used by the download step, which
// REFPARITY never exercises.
module.exports = {
  open() { throw new Error('yauzl stub: download step is out of REFPARITY scope'); },
};
